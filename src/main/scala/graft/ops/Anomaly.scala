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

  /** CUSUM change-point scan per series, in EXACT integer arithmetic:
    * with n observations, total S = Σxq and prefix sums P_k, the
    * centered cumulative sum at position k is
    *
    *   C_k = Σ_{i≤k}(x_i − S/n) · n  =  n·P_k − k·S
    *
    * (scaled by n so the mean never becomes a float). The change-point
    * estimate is the k maximizing |C_k| — the classic CUSUM location
    * statistic; `cusum_max = max|C_k| / (n · n)` approximates the
    * level-shift × run-length product a monitor thresholds on, left
    * to the caller as the exact integer pair (c_abs, n).
    *
    * Scale shape: ONE per-series window (prefix sum + row number +
    * per-partition totals over the same frame — Spark collapses them
    * into a single sort), then an order-free struct-max aggregation
    * per series: the shuffle after the window carries one candidate
    * row per series per partition. The argmax tie-break is the
    * lexicographic (c_abs, c, k, ord) struct — deterministic and
    * replicated by DuckDB's identical struct ordering.
    *
    * @return (entity, n, k_star, ord_star, cusum_star, cusum_abs)
    */
  def cusumChangePoint(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val xq = floor(col(valueCol).cast("double") * 100).cast("long")
    val wOrd = Window.partitionBy(col("entity"))
      .orderBy(col("t"), col("ord"))
    val wAll = Window.partitionBy(col("entity"))
    val scored = events
      .select(col(entityCol).as("entity"), col(tsCol).as("t"),
        col(ordCol).as("ord"), xq.as("xq"))
      .withColumn("pk", sum(col("xq")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("k", row_number().over(wOrd))
      .withColumn("s", sum(col("xq")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("c", col("n") * col("pk") - col("k") * col("s"))
    scored
      .groupBy(col("entity"))
      .agg(
        max(col("n")).as("n"),
        max(struct(abs(col("c")).as("a"), col("c").as("c"),
          col("k").cast("long").as("k"), col("ord").as("i"))).as("m"))
      .select(col("entity"), col("n"),
        col("m").getField("k").as("k_star"),
        col("m").getField("i").as("ord_star"),
        col("m").getField("c").as("cusum_star"),
        col("m").getField("a").as("cusum_abs"))
  }

  /** Binary-segmentation changepoint LOCATOR per group: the split k
    * minimizing within-segment sum of squares (ties to the earliest
    * split) over the time-ordered series — [[cusumChangePoint]]
    * detects that a level shift happened; this fits WHERE, with the
    * level on each side and the variance the split explains.
    *
    * Exactness: all segment sums/squares fold as exact longs inside
    * the collected calendar-bounded array; each candidate cost is
    * the double expression `(QL − SL²/k) + (QR − SR²/(n−k))` over
    * those integers, written identically in the oracle, so the
    * argmin (array_position on the exact min) agrees bit-for-bit.
    * O(n²) integer work per group on ≤ days-per-group elements.
    *
    * Scale shape: one hash agg to per-group arrays; everything after
    * is per-row expression work. Bin first beyond a few thousand
    * points per group.
    *
    * @return (g, n, split_t, mean_left, mean_right, sse_drop)
    */
  def changepointBinary(
      series: DataFrame,
      gCol: org.apache.spark.sql.Column,
      tCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column): DataFrame = {
    def sl(k: String) =
      s"CAST(aggregate(slice(ys, 1, $k), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)"
    def ql(k: String) =
      s"CAST(aggregate(slice(ys, 1, $k), CAST(0 AS BIGINT), (a, v) -> a + v*v) AS DOUBLE)"
    val cost =
      s"""(${ql("k")} - ${sl("k")}*${sl("k")}/CAST(k AS DOUBLE))
          + ((q_tot - ${ql("k")})
             - (s_tot - ${sl("k")})*(s_tot - ${sl("k")})
               /(CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"""
    series.select(gCol.as("g"), tCol.as("t"), yCol.as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        expr("sort_array(collect_list(struct(t, y)))").as("pts"))
      .filter(col("n") >= 2)
      .select(col("g"), col("n"),
        expr("transform(pts, x -> x.t)").as("ts"),
        expr("transform(pts, x -> x.y)").as("ys"))
      .withColumn("s_tot", expr(sl("CAST(n AS INT)")))
      .withColumn("q_tot", expr(ql("CAST(n AS INT)")))
      .withColumn("costs", expr(
        s"transform(sequence(1, CAST(n - 1 AS INT)), k -> $cost)"))
      .withColumn("mincost", expr("array_min(costs)"))
      .withColumn("k", expr("CAST(array_position(costs, mincost) AS INT)"))
      .select(col("g"), col("n"),
        expr("CAST(element_at(ts, k) AS STRING)").as("split_t"),
        expr(s"${sl("k")}/CAST(k AS DOUBLE)").as("mean_left"),
        expr(s"""(s_tot - ${sl("k")})
            /(CAST(n AS DOUBLE) - CAST(k AS DOUBLE))""").as("mean_right"),
        expr("(q_tot - s_tot*s_tot/CAST(n AS DOUBLE)) - mincost")
          .as("sse_drop"))
  }
}
