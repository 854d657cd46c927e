package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of: latest right ≤ left time; equal timestamps match; no match → null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // after two rights → latest wins
      (2L, 10L, ts("2024-01-02 00:00:00")), // equal to a right ts → matches it
      (3L, 10L, ts("2023-12-31 00:00:00")), // before all rights → null
      (4L, 99L, ts("2024-01-05 00:00:00"))) // key with no rights → null
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a"),
      (10L, ts("2024-01-02 00:00:00"), "b"),
      (10L, ts("2024-01-04 00:00:00"), "c"))
      .toDF("rk", "rt", "tag")
    val out = AsOf.joinBackward(left, "k", "t", right, "rk", "rt", Seq("tag"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tag_asof")).toMap
    assert(out == Map(1L -> "c", 2L -> "b", 3L -> null, 4L -> null))
  }

  test("matched right row is atomic: null field NOT resurrected from older row") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a1", "b10"),
      (10L, ts("2024-01-02 00:00:00"), null, "b20"))
      .toDF("rk", "rt", "a", "b")
    val r = AsOf.joinBackward(left, "k", "t", right, "rk", "rt", Seq("a", "b"))
      .collect().head
    // the t=2024-01-02 row matches; its a IS null — must not pick up
    // "a1" from the older row (composite row that never existed)
    assert(r.getAs[String]("a_asof") == null)
    assert(r.getAs[String]("b_asof") == "b20")
  }

  test("as-of plan: single shuffle on the key, no cross product") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("event_id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), "a")).toDF("rk", "rt", "tag")
    val plan = AsOf.joinBackward(left, "k", "t", right, "rk", "rt", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }
}
