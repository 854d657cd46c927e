package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: the write-side technique that
  * removes the shuffle from repeated big-fact joins at 100 TB. Both
  * sides bucketed by the join key into the same bucket count join
  * with NO exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("join of co-bucketed tables plans no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        spark.table("orders_b")("o_custkey") === spark.table("customer_b")("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1500)
  }
}
