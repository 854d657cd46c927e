package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive k-gram hashes over each document and keep, per
  * window, the minimum hash (rightmost on ties). The selected
  * (position, hash) set is a provably bounded-density fingerprint
  * with the matching GUARANTEE plain 0-mod-p sampling lacks: any
  * shared substring of at least k+w−1 words produces at least one
  * common fingerprint, while expected density stays 2/(w+1).
  * Complements [[graft.ops.TextOps.fingerprint]] (whole-doc rolling
  * hash: exact-copy detection) and MinHash (set resemblance) with
  * POSITIONAL partial-overlap evidence — the plagiarism/quotation/
  * boilerplate-span detector.
  *
  * Exactness: k-gram hashes are the corpus-wide word-hash fold
  * (acc·31 + wordHash mod 1e9+7 — the `q_fingerprint` convention);
  * the rightmost-min-per-window rule is an integer `least` fold over
  * the tie-coded key `h·2²⁰ + (2²⁰−1−pos)` (min hash first, then
  * LARGEST position), decoded back with div/mod on positives — no
  * struct comparisons, so every engine agrees bit-for-bit.
  *
  * Scale shape: the ENTIRE selection happens inside the row's array
  * domain — k-gram hashes, per-window minima, and dedup
  * (`array_distinct`) are codegen'd expressions in the projection,
  * so the operator is embarrassingly parallel with ZERO exchanges
  * (compare a window-function formulation, which would shuffle one
  * row per k-gram just to sort each document's own positions). Work
  * is O(words·w) per document. Position capacity is 2²⁰ k-grams per
  * document — beyond million-word documents, chunk first
  * ([[Chunking]]).
  */
object Winnow {

  /** Position capacity per document: keys are h·PosCap + (PosCap−1−pos). */
  private val PosCap = 1L << 20

  /** Selected winnowing fingerprints, one row per distinct
    * (document, position, hash) selection.
    *
    * @param k shingle width in words (hash unit)
    * @param w window width in k-grams (guarantee: matches of
    *          ≥ k+w−1 words share a fingerprint)
    * @return (id, fp_pos, fp_hash); documents with fewer than
    *         k+w−1 words emit nothing
    */
  def fingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "winnowing needs k >= 1 and w >= 1")
    val ws = TextOps.words(col(textCol))
    val grams = transform(
      sequence(lit(1), size(col("ws")) - (k - 1)),
      i => aggregate(slice(col("ws"), i, lit(k)), lit(0L),
        (acc, x) => (acc * 31L + TextOps.wordHash(x)) % 1000000007L))
    // per full window ending at 0-based k-gram position p: the least
    // tie-coded key over positions p-w+1 .. p
    val sel = transform(
      sequence(lit(w - 1), size(col("hs")) - 1),
      p => aggregate(sequence(p - (w - 1), p), lit(Long.MaxValue),
        (acc, i) => least(acc,
          element_at(col("hs"), i + 1) * PosCap
            + (lit(PosCap - 1) - i))))
    df.select(col(idCol).as("id"), ws.as("ws"))
      .filter(size(col("ws")) >= k + w - 1)
      .select(col("id"), grams.as("hs"))
      .select(col("id"), explode(array_distinct(sel)).as("mk"))
      .select(col("id"),
        (lit(PosCap - 1) - (col("mk") % PosCap)).as("fp_pos"),
        expr(s"mk div $PosCap").as("fp_hash"))
  }

  /** Overlap-candidate pairs from winnowing fingerprints — the
    * plagiarism/quotation detector [[fingerprints]] exists to feed:
    * document pairs sharing at least `minShared` distinct selected
    * hashes, with the shared count as evidence. By the winnowing
    * guarantee every common word run of length ≥ k+w−1 contributes a
    * shared fingerprint, so genuine partial overlaps can't be missed;
    * `maxDf` drops corpus-ubiquitous fingerprints (boilerplate) the
    * same way [[Dedup.jaccardPairs]] cuts hot shingles.
    *
    * Scale shape: the posting frame is built once and persisted (it
    * feeds both the document-frequency cut and the pair join); pair
    * generation GROUPS the posting list per hash and explodes ordered
    * pairs (the [[Dedup.jaccardPairs]] rewrite — one posting
    * pipeline, fan-out bounded by maxDf²), never a posting self-join.
    *
    * @return (doc_id_a, doc_id_b, shared) with doc_id_a < doc_id_b
    */
  def overlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 256): DataFrame = {
    val posts = fingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("fp_hash").as("h")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hcut = posts.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= maxDf)
      .select(col("h"))
    posts.join(hcut, Seq("h"))
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("id"))).as("docs"))
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("doc_id_a"), col("b").as("doc_id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
