package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank: bit-equality with a sequential model, partition
  * invariance, and sanity of the rank ordering on a known graph.
  */
class GraphsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Sequential model with identical integer arithmetic. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var r = nodes.map(_ -> Graphs.Scale).toMap
    for (_ <- 1 to iters) {
      val inflow = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(n =>
        n -> (15L * Graphs.Scale / 100L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int): Map[Long, Long] =
    Graphs.integerPageRank(
      edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank bit-matches the sequential model and is partition-invariant") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val expected = model(edges, 3)
    assert(run(edges, 3, 1) == expected)
    assert(run(edges, 3, 7) == expected)
  }

  test("hub node outranks leaves on a star graph") {
    // undirected star: leaves 1..5 <-> hub 0
    val edges = (1L to 5L).flatMap(l => Seq((l, 0L), (0L, l)))
    val out = run(edges, 3, 3)
    assert(out == model(edges, 3))
    assert((1L to 5L).forall(l => out(0L) > out(l)))
  }

  test("dangling ranks leak but never go below the damping floor") {
    val out = run(Seq((1L, 2L)), 2, 2) // 2 has no out-edges
    assert(out == model(Seq((1L, 2L)), 2))
    assert(out.values.forall(_ >= 15L * Graphs.Scale / 100L))
  }
}
