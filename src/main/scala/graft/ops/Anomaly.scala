package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window z-score anomaly detection over per-series event
  * counts — the monitoring pass a pipeline runs over its own ingest
  * volumes (sudden per-type spikes and droughts) — in EXACT integer
  * arithmetic: with S = Σx and Sxx = Σx² over the n trailing
  * observations, z² > t² is equivalent to
  *
  *   (n·x − S)² > t² · (n·Sxx − S²)
  *
  * — all 64-bit integers, so the flag is bit-stable across engines and
  * partitionings (no float mean/stddev anywhere). A constant baseline
  * (variance 0) flags ANY deviation, the z → ∞ limit.
  *
  * Scale shape: the corpus-sized work is the (hour, series) count
  * aggregation — one shuffle over the raw events. The window pass then
  * runs over the tiny per-series hourly frame, partitioned by series
  * and ordered by the lexicographically-chronological hour string;
  * frame bounds are ROWS (trailing n observations), so gaps in the
  * hour sequence widen the lookback rather than shrinking the sample.
  * Rows without a full n-observation history are not scored.
  */
object Anomaly {

  /** Hourly count anomalies per `seriesCol`: rows whose count deviates
    * from the trailing-`n` baseline by more than `threshold` standard
    * deviations, either direction. Returns every scored row with its
    * integer evidence: (series, hour, cnt, baseline_sum, dev = n·x − S,
    * var_nsq = n·Sxx − S², is_anomaly).
    */
  def hourlyAnomalies(
      events: DataFrame,
      seriesCol: String,
      tsCol: String,
      n: Int = 24,
      threshold: Int = 3): DataFrame = {
    val hourly = events
      .groupBy(col(seriesCol).as("series"),
        date_format(col(tsCol), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("series")).orderBy(col("hour"))
      .rowsBetween(-n, -1)
    hourly
      .withColumn("baseline_sum", sum(col("cnt")).over(w))
      .withColumn("sxx", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("nb", count(lit(1)).over(w))
      .filter(col("nb") === n.toLong)
      .withColumn("dev", lit(n.toLong) * col("cnt") - col("baseline_sum"))
      .withColumn("var_nsq",
        lit(n.toLong) * col("sxx") - col("baseline_sum") * col("baseline_sum"))
      .withColumn("is_anomaly",
        (col("dev") * col("dev") >
          lit((threshold * threshold).toLong) * col("var_nsq")).cast("long"))
      .select(col("series"), col("hour"), col("cnt"), col("baseline_sum"),
        col("dev"), col("var_nsq"), col("is_anomaly"))
  }
}
