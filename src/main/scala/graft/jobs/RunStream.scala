package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStreams

/** CLI surface for the streaming module: drives the hourly windowed
  * aggregation over the events table replayed as a file stream (one
  * parquet = one micro-batch), printing the closed windows. Usage:
  * RunStream <sfDir>
  */
object RunStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = spark.read.parquet(s"$sfDir/{events}.parquet").schema
    // same schema-adaptive ts handling as graft.Tables.events — the
    // testdata has shipped both TIMESTAMP(NANOS)-as-long and
    // TIMESTAMP(MICROS, NTZ) encodings
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsCol = schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    val stream = spark.readStream.schema(schema)
      .parquet(s"$sfDir/{events}.parquet")
      .withColumn("ts", tsCol)
      .where(col("event_id").isNotNull)
    val agg = EventStreams.hourlyCounts(stream, watermarkDelay = "1 minute")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("hourly").count()
    val sample = spark.table("hourly").orderBy("hour", "event_type").limit(3)
      .collect().mkString("; ")
    println(s"[stream] closed windows: $n; sample: $sample")
    spark.stop()
  }
}
