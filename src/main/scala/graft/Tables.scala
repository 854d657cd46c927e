package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over the harness testdata layout
  * (`TESTDATA.md`): one parquet file per table under the sf dir.
  *
  * All queries go through here so that scan-level concerns (schema
  * pruning, pushdown) stay in one place. At cluster scale the same
  * API would point at a partitioned table root instead of a single
  * file — the call sites don't change.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects by default; read nanos as long and truncate to
    * microsecond TimestampType (the data is µs-aligned). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the session —
    * set by [[GraftSession]]; this loader deliberately does NOT
    * mutate the caller's session conf behind its back.
    */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
