package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via deletion-neighborhood blocking
  * — the FastSS scheme: two strings at Levenshtein distance ≤ 1 share
  * at least one key among {s} ∪ {s with one character deleted}, so
  * blocking on those keys turns the all-pairs comparison into an
  * equi-join, with the exact `levenshtein` check run on candidates
  * only. Typo-dedup for entity names, vocab terms, URLs.
  *
  * Scale shape: the blocking explode emits |s|+1 keys per row (bounded
  * by string length), the join shuffles on the key, and candidate
  * volume is governed by block selectivity, not |R|² — same candidate
  * discipline as the LSH family. A pair sharing several keys is
  * deduplicated BEFORE the distance check, so the verify cost is one
  * levenshtein per distinct candidate pair.
  */
object FuzzyJoin {

  /** Distinct (id_a, id_b) pairs (a < b) whose strings are at
    * Levenshtein distance ≤ 1 (including exact duplicates).
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // array_distinct BEFORE the explode: deleting any character of a
    // repeated run yields the same variant (think zero-padded ids), so
    // without it a hot block multiplies candidates by the run length
    // on BOTH join sides — quadratic in the multiplicity
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), col("s"),
        explode(array_distinct(concat(
          array(col("s")),
          transform(sequence(lit(1), length(col("s"))),
            i => concat(
              col("s").substr(lit(1), i - 1),
              col("s").substr(i + 1, length(col("s")))))))).as("k"))
    val a = keyed.select(col("id").as("id_a"), col("s").as("s_a"), col("k"))
    val b = keyed.select(col("id").as("id_b"), col("s").as("s_b"), col("k"))
    a.join(b, "k")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
      .filter(levenshtein(col("s_a"), col("s_b")) <= 1)
      .select(col("id_a"), col("id_b"))
  }

  /** Zero-preserving per-row neighbor counts: (idCol, n_fuzzy). */
  def editDistance1Counts(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val pairs = editDistance1Pairs(df, idCol, strCol)
    // both endpoints in ONE pass: the union-of-two-projections shape
    // evaluated the whole blocking/verify pipeline twice
    val undirected = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
    df.select(col(idCol).as("id"))
      .join(undirected.groupBy("id").agg(count(lit(1)).as("n_fuzzy")), Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("n_fuzzy"), lit(0L)).as("n_fuzzy"))
  }
}
