package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch range join via time binning — the operator family Spark has
  * no native physical strategy for: a join whose ONLY predicate is a
  * range (`|t_a − t_b| ≤ δ`), no equi-key at all. Left as-is, Catalyst
  * plans that as BroadcastNestedLoopJoin / cartesian — a non-starter
  * past broadcast size.
  *
  * The standard fix (range-join binning, as in Flink interval joins
  * and warehouse range-join optimizations): quantize time into δ-wide
  * bins, explode the PROBE side to its bin ±1 (any in-range partner's
  * bin differs by at most 1), equi-join on the bin, and re-check the
  * exact predicate on the residual. Each candidate pair meets exactly
  * once (the build row sits in one bin; the probe covers it once), so
  * no post-join dedup is needed.
  *
  * Scale shape: the bin is a high-cardinality equi-key → ordinary
  * shuffled hash join; candidate volume is bounded by 3·density·δ per
  * row rather than |L|·|R|; a bursty hot bin is ordinary join skew
  * (AQE skew-join splits it). Bin arithmetic is integer floor
  * division on epoch-µs — exactly replicable in the oracle.
  */
object RangeJoin {

  /** For every row of `events`, the number of OTHER rows within
    * `deltaSeconds` of it (inclusive), zero-preserving:
    * (idCol, n_neighbors). Self-counting is excluded by id, so exact
    * ts duplicates still count each other.
    */
  def neighborCounts(
      events: DataFrame,
      idCol: String,
      tsCol: String,
      deltaSeconds: Long): DataFrame = {
    val deltaUs = deltaSeconds * 1000000L
    val t = events.select(
      col(idCol).as("id"), unix_micros(col(tsCol)).as("t"))
    val probe = t.select(
      col("id"), col("t"),
      explode(array(
        expr(s"t div $deltaUs") - 1L,
        expr(s"t div $deltaUs"),
        expr(s"t div $deltaUs") + 1L)).as("bin"))
    val build = t.select(
      col("id").as("rid"), col("t").as("rt"),
      expr(s"t div $deltaUs").as("bin"))
    val counts = probe.join(build, "bin")
      .filter(abs(col("t") - col("rt")) <= deltaUs && col("id") =!= col("rid"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_neighbors"))
    t.select(col("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }
}
