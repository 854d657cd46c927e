package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-bucketed series analytics over event streams: additive
  * seasonal decomposition, lagged cross-correlation, and exact
  * sliding-window distinct actives (the WAU curve). The
  * [[Moments]]/[[Timeseries]] exactness discipline throughout: every
  * aggregate is an integer fold over a CALENDAR-BOUNDED summary frame
  * (hours/days, not input rows), detrending happens in scaled
  * integers (`24·cnt − Σwindow` instead of float subtraction), and
  * doubles appear once in closing expressions shared token-for-token
  * with the DuckDB oracle.
  *
  * Time rides as integer day/hour numbers (days since epoch via
  * `datediff`) — no interval arithmetic, no timezone re-parses, and
  * lag joins become integer equi-joins.
  */
object SeriesOps {

  /** Pearson r from exact sufficient sums (n, sx, sy, sxx, syy, sxy
    * in scope as DOUBLE-cast columns). */
  val PearsonExpr: String =
    """CASE WHEN n*sxx - sx*sx = 0.0 OR n*syy - sy*sy = 0.0 THEN 0.0
       ELSE (n*sxy - sx*sy) /
            (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
       END"""

  /** Additive seasonal decomposition of the hourly event-count
    * series: trend = centered 24-row moving average (complete
    * windows only), seasonal = hour-of-day mean of the detrended
    * series, remainder = the rest. Detrending stays integral —
    * `d24 = 24·cnt − Σwindow` — so the seasonal means are exact
    * integer folds; each output double is one closing division.
    *
    * The windows ride the hourly summary frame (calendar-bounded:
    * one row per hour WITH data), so the global sort is over
    * thousands of rows regardless of input size.
    *
    * @return (hour, cnt, trend, seasonal, remainder) — trend and
    *         remainder NULL on incomplete edge windows
    */
  def seasonalDecompose(df: DataFrame, tsCol: String): DataFrame = {
    // persisted: the windowed frame feeds both the seasonal means and
    // the final join — without the cache the events scan runs twice
    val hourly = df
      .select(date_trunc("hour", col(tsCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val win = Window.orderBy("h").rowsBetween(-11, 12)
    val w = hourly
      .withColumn("sumw", sum(col("cnt")).over(win))
      .withColumn("cw", count(lit(1)).over(win))
      .withColumn("hod", hour(col("h")))
      .withColumn("sumw", when(col("cw") === 24, col("sumw")))
      .withColumn("d24",
        when(col("cw") === 24, lit(24L) * col("cnt") - col("sumw")))
    val season = w.groupBy("hod")
      .agg(sum(col("d24")).as("sd"), count(col("d24")).as("sc"))
    w.join(broadcast(season), Seq("hod"))
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("cnt"),
        expr("CAST(sumw AS DOUBLE)/24.0").as("trend"),
        expr("""CASE WHEN sc = 0 THEN 0.0
                ELSE CAST(sd AS DOUBLE)/(24.0*CAST(sc AS DOUBLE))
                END""").as("seasonal"),
        expr("""CAST(d24 AS DOUBLE)/24.0 -
                CASE WHEN sc = 0 THEN 0.0
                ELSE CAST(sd AS DOUBLE)/(24.0*CAST(sc AS DOUBLE))
                END""").as("remainder"))
  }

  /** Lagged cross-correlation between the daily count series of two
    * event types: r(L) = corr(a[d], b[d−L]) for L in 0..maxLag,
    * inner-joined on days where both offsets have data. One scan
    * folds both series; the lag fan-out and equi-join ride the daily
    * summary frame. Counts fold as DECIMAL(12,0) so the Pearson
    * products stay exact to ~1e12 events/day.
    *
    * @return (lag, n_days, r)
    */
  def crossCorrelation(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      typeA: String,
      typeB: String,
      maxLag: Int): DataFrame = {
    val daily = df
      .filter(col(typeCol).isin(typeA, typeB))
      .select(
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01"))).as("dn"),
        (col(typeCol) === typeA).as("isa"))
      .groupBy("dn")
      .agg(
        sum(when(col("isa"), 1L).otherwise(0L))
          .cast("decimal(12,0)").as("ca"),
        sum(when(!col("isa"), 1L).otherwise(0L))
          .cast("decimal(12,0)").as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lagged = daily.select(col("dn"), col("cb"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
      .select((col("dn") + col("lag")).as("dn"), col("lag"), col("cb"))
    daily.select(col("dn"), col("ca")).join(lagged, Seq("dn"))
      .groupBy("lag")
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("ca")).cast("double").as("sx"),
        sum(col("cb")).cast("double").as("sy"),
        sum(col("ca") * col("ca")).cast("double").as("sxx"),
        sum(col("cb") * col("cb")).cast("double").as("syy"),
        sum(col("ca") * col("cb")).cast("double").as("sxy"))
      .withColumn("n", col("n_days").cast("double"))
      .select(col("lag").cast("long").as("lag"), col("n_days"),
        expr(PearsonExpr).as("r"))
  }

  /** Exact trailing-window distinct actives per day (WAU for
    * `windowDays = 7`) WITHOUT a per-day distinct pass: each user's
    * day-set becomes merged coverage intervals (gaps ≤ window merge),
    * intervals become ±1 boundary deltas, and the per-day count is a
    * [[Prefix.runningTotal]] over the delta stream — distributed
    * range-partitioned prefix sums, no day×user blowup, no
    * single-task sort over data-sized frames.
    *
    * @return (day_n, wau) for each day present in the input, day_n =
    *         days since 1970-01-01
    */
  def slidingDistinctActives(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int): DataFrame = {
    val ud = df.select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01"))).as("dn"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byU = Window.partitionBy("u").orderBy("dn")
    val islands = ud
      .withColumn("brk",
        when(col("dn") - lag(col("dn"), 1).over(byU) <= windowDays - 1, 0L)
          .otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        byU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("u", "grp")
      .agg(min("dn").as("s"), (max(col("dn")) + (windowDays - 1)).as("e"))
    val deltas = islands.select(col("s").as("dn"), lit(1L).as("delta"))
      .unionAll(islands.select((col("e") + 1).as("dn"),
        lit(-1L).as("delta")))
      .groupBy("dn").agg(sum("delta").as("delta"))
      .select((col("dn") * 2).as("k"), col("dn"), col("delta"))
    val markers = ud.select(col("dn")).distinct()
      .select((col("dn") * 2 + 1).as("k"), col("dn"), lit(0L).as("delta"))
    Prefix.runningTotal(deltas.unionAll(markers), "k", "delta")
      .filter(col("k") % 2 === 1)
      .select(col("dn").cast("long").as("day_n"), col("cum").as("wau"))
  }
}
