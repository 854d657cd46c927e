package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpressions

/** Benchmark decontamination: flag corpus documents that share word
  * n-gram shingles with a probe set (eval benchmarks, held-out test
  * suites). Standard practice before training on a scraped corpus —
  * any document overlapping the eval set by even one shingle leaks
  * test data into training.
  *
  * Scale shape: the probe set is SMALL relative to the corpus (eval
  * suites are thousands of documents against billions), so its
  * distinct shingle set broadcasts; the corpus text flows through one
  * scan→shingle→explode pipeline probed by a broadcast hash join — no
  * shuffle ever carries corpus text. (A second, id-column-only corpus
  * scan restores the zero rows for clean/short documents; it moves one
  * pruned column, not text.) If the probe set outgrows broadcast, swap
  * the broadcast for [[BloomJoin.bloomSemiJoin]]'s prefilter shape
  * (the Bloom false positives would make the report approximate, so
  * it is not the default).
  *
  * Both sides shingle with the same distinct word-3-gram expression as
  * [[Dedup]], so the DuckDB oracle replicates the overlap counts
  * bit-for-bit.
  */
object Contamination {

  /** Per corpus document: how many of its distinct shingles appear
    * anywhere in the probe set, and the contaminated flag (≥ 1 shared
    * shingle). Documents too short to shingle (< 3 words) report 0.
    */
  def contaminationReport(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def shingled(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("id"),
          explode(ShingleExpressions.distinctWordShingles(col("ws"))).as("s"))
    val probeShingles = shingled(probe).select(col("s")).distinct()
    // corpus shingles are distinct per doc and probe shingles distinct
    // overall, so count(1) after the join IS the distinct-overlap count
    val hits = shingled(corpus)
      .join(broadcast(probeShingles), Seq("s"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_shingles"),
        (coalesce(col("n_shared"), lit(0L)) > 0L).cast("long").as("is_contaminated"))
  }
}
