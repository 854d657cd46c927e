package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Graph analytics beyond [[Clusters]]' connected components:
  * PageRank in exact integer arithmetic.
  *
  * Floating-point PageRank is partition-order-dependent (rank sums),
  * so this variant keeps ranks as 2^20-scaled longs: contributions
  * are `rank div outdeg` (long floor division), per-node inflow is an
  * exact long sum (order-free), and damping is integer
  * `(15·SCALE) div 100 + (85·inflow) div 100`. Every step is
  * bit-deterministic under any partitioning and exactly replicable in
  * SQL — which is what lets a fixed-iteration run hash-match a
  * cross-engine oracle, the same discipline as the quantized k-means
  * update. The deliberate cost: each division floors away < 1 rank
  * unit (≈ 2^-20), a bounded bias no ranking consumer can observe.
  *
  * Scale shape: ranks shuffle on node id, contributions on dst —
  * ordinary shuffled joins/aggs carrying (long, long) pairs only; the
  * rank frame is eagerly checkpointed per round and the superseded
  * round freed (the [[Clusters.connectedComponents]] lesson), so
  * round r+1 starts from materialized ranks instead of replaying
  * rounds 1..r.
  */
object Graphs {

  val Scale: Long = 1L << 20

  /** Fixed-iteration integer PageRank over a directed edge list
    * (duplicate edges are counted once). Returns (node, rank_scaled)
    * for every node appearing as src or dst; callers divide by
    * [[Scale]] for a float rank. Nodes with no out-edges contribute
    * nothing (rank leak) — pass a symmetrized edge list for
    * leak-free undirected semantics.
    */
  def integerPageRank(
      edgesIn: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val edges = edgesIn
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.select(col("node"), lit(Scale).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val inflow = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), expr("r div outdeg").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("s"))
      val next = nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * Scale / 100L) +
            expr("(85 * coalesce(s, bigint(0))) div 100")).as("r"))
        .localCheckpoint()
      unpersistCheckpoint(ranks)
      ranks = next
    }
    edges.unpersist()
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD =>
      lr.rdd.unpersist(blocking = false)
    }
}
