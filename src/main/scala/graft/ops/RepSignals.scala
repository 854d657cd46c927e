package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Intra-document repetition signals (the Gopher-rules family):
  * boilerplate and template-generated text repeats itself, so the
  * fraction of token mass sitting in repeated words / repeated
  * n-grams is a strong junk filter for LM training corpora.
  *
  * Per document:
  *  - `n_words` — token count;
  *  - `top_word_n` / `top_bigram_n` — occurrence count of the most
  *    frequent word / word-bigram (the count is unique even when the
  *    argmax item isn't, so the output stays deterministic);
  *  - `dup_word_frac` — fraction of word occurrences whose word
  *    appears more than once;
  *  - `dup_bigram_frac` — fraction of bigram positions whose bigram
  *    appears more than once.
  *
  * Scale shape: two explode→hash-agg passes (words, bigrams), both
  * map-side-combinable, shuffling only (doc_id, token, count) — the
  * same profile as term-frequency counting, linear in corpus size.
  * Fractions are exact integer counts divided in double (zero
  * denominators pinned to 0.0 on both engines, not NaN/Inf).
  */
object RepSignals {

  private def fracCol(num: Column, den: Column): Column =
    when(den === 0L, lit(0.0))
      .otherwise(num.cast("double") / den.cast("double"))

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
    val lens = base.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))

    def gramStats(grams: DataFrame, top: String, dup: String, tot: String): DataFrame =
      grams
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(
          max(col("cnt")).as(top),
          coalesce(sum(when(col("cnt") > 1L, col("cnt"))), lit(0L)).as(dup),
          sum(col("cnt")).as(tot))

    val wordStats = gramStats(
      base.select(col("doc_id"), explode(col("ws")).as("g")),
      "top_word_n", "dup_word_occ", "n_word_occ")

    // bigram i = ws[i] + " " + ws[i+1]; guarded — Spark's sequence()
    // walks BACKWARDS for start > stop, so size<2 must short-circuit
    // to an empty array rather than sequence(1, 0)
    val bigrams = base
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1), i =>
          concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1)))).as("g"))
    val bigramStats = gramStats(bigrams, "top_bigram_n", "dup_bigram_occ", "n_bigrams")

    lens
      .join(wordStats, Seq("doc_id"), "left")
      .join(bigramStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words"),
        coalesce(col("top_word_n"), lit(0L)).as("top_word_n"),
        fracCol(coalesce(col("dup_word_occ"), lit(0L)), col("n_words")).as("dup_word_frac"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        fracCol(coalesce(col("dup_bigram_occ"), lit(0L)),
          coalesce(col("n_bigrams"), lit(0L))).as("dup_bigram_frac"))
  }
}
