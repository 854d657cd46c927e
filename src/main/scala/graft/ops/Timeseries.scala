package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: gap filling onto a fixed-step bucket
  * spine plus forward fill — the step that turns an irregular event
  * log into the dense per-entity series that rate monitors, feature
  * windows, and training-curriculum schedulers consume. (The
  * reference's engine has no temporal axis beyond snapshot stamping;
  * this is part of the §7.4 extension surface.)
  *
  * Scale shape: the spine is GENERATED DISTRIBUTED — each entity's
  * per-bucket range rides out of its own aggregate row via
  * `sequence(...)` + `explode`, so there is no driver-side calendar
  * loop and no cross join against a global calendar table (a global
  * calendar × entities cross join would shuffle |entities|·|buckets|
  * rows even for entities active one hour). Work is Σ per-entity
  * span, the output's own size. The pipeline is bucket-agg (one
  * shuffle on (entity, bucket)), per-entity bounds (clusters on
  * entity), spine join back (left join on (entity, bucket)), then
  * the forward-fill window partitioned by entity — per-entity series
  * sort within their partition, never a global sort.
  *
  * Determinism: bucket edges come from `date_trunc`, counts are
  * exact longs, the carried value is a per-bucket `max` (order-free),
  * and the fill reads `last(..., ignoreNulls)` over the unique
  * (entity, bucket) ordering — bit-stable under any partitioning.
  */
object Timeseries {

  /** Dense hourly series per entity: one row per hour between the
    * entity's first and last event (inclusive), `n_events` = 0 on
    * gap hours, `v_ffill` = the most recent non-null hourly
    * `max(valueCol)` at or before that hour (null until the entity's
    * first non-null value).
    *
    * @return (entity, hour TIMESTAMP, n_events BIGINT, v_ffill DOUBLE)
    */
  def gapFillHourly(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .select(
        col(entityCol).as("entity"),
        date_trunc("hour", col(tsCol)).as("hour"),
        col(valueCol).cast("double").as("v"))
      .groupBy(col("entity"), col("hour"))
      .agg(count(lit(1)).as("n_events"), max(col("v")).as("vmax"))
    val bounds = hourly
      .groupBy(col("entity"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = bounds.select(
      col("entity"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val joined = spine.join(hourly, Seq("entity", "hour"), "left")
    val w = Window.partitionBy(col("entity")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col("entity"),
      col("hour"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      last(col("vmax"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** OHLC bar resampling: per (entity, bucket) the first/highest/
    * lowest/last value plus event count and an exact fixed-point
    * value sum. "First"/"last" are made deterministic by ordering on
    * `(ts, ord)` — the struct-min trick (`min(struct(ts, ord, v)).v`,
    * the [[Clusters]] keep-best discipline), an order-free hash
    * aggregation (NO per-entity sort, NO window): the partial
    * aggregates keep one candidate struct per (entity, bucket) per
    * partition, so the shuffle carries bars, not events. That is the
    * 100 TB shape — a sort-based "first value per bucket" window
    * would sort every entity's full history instead.
    *
    * @return (entity, bucket, n_events, open, high, low, close,
    *          sum_cents) — open/close are raw input values (no
    *          arithmetic), high/low exact min/max, sum_cents an exact
    *          BIGINT fold; every column hash-stable cross-engine.
    */
  def resampleOhlc(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      valueCol: String,
      unit: String = "hour"): DataFrame = {
    val v = col(valueCol).cast("double")
    val keyed = struct(col(tsCol).as("t"), col(ordCol).as("i"), v.as("v"))
    events
      .groupBy(
        col(entityCol).as("entity"),
        date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        min(keyed).getField("v").as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max(keyed).getField("v").as("close"),
        sum(floor(v * 100).cast("long")).as("sum_cents"))
  }

  /** Per-row lag deltas over each entity's series: the change of the
    * (exact fixed-point) value versus the previous observation of the
    * same entity, ordered by `(ts, ord)`. First observation per
    * entity has a null delta. The window partitions by entity — each
    * series sorts inside its own partition (parallelism = #entities,
    * which is the natural key cardinality; no global sort). Deltas
    * are BIGINT cents so the result is hash-exact cross-engine.
    *
    * @return input keys + (v_cents, delta_cents)
    */
  def lagDeltas(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val xq = floor(col(valueCol).cast("double") * 100).cast("long")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
    events.select(
      col(entityCol),
      col(ordCol),
      xq.as("v_cents"),
      (xq - lag(xq, 1).over(w)).as("delta_cents"))
  }

  /** Lag-1 autocorrelation per group: Pearson r between consecutive
    * observations of each `(group, entity)` series, aggregated per
    * group. All sufficient statistics are exact BIGINT sums over
    * fixed-point cents (the `q_ols_fit` discipline), so the final
    * double arithmetic — identical expression order in the oracle —
    * is bit-stable. Two shuffle-free-ish stages: the lag window
    * partitions by (group, entity) (per-series sort inside its
    * partition), then ONE partial-combining hash aggregation per
    * group; the shuffle carries 7 longs per group per partition.
    *
    * @return (group, n_pairs, r)
    */
  def autocorrLag1(
      events: DataFrame,
      groupCol: String,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      valueCol: String): DataFrame = {
    val xq = floor(col(valueCol).cast("double") * 100).cast("long")
    val w = Window.partitionBy(col(groupCol), col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
    val pairs = events
      .select(col(groupCol).as("g"), xq.as("x"),
        lag(xq, 1).over(w).as("y"))
      .filter(col("y").isNotNull)
    // second-order products in decimal: Σx² of cents-scale longs per
    // group passes 2^63 in the single-digit-TB range (the olsFit
    // overflow discipline) and BIGINT wrap is silent
    val d18 = "decimal(18,0)"
    pairs
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x").cast(d18) * col("x").cast(d18)).cast("double").as("sxx"),
        sum(col("y").cast(d18) * col("y").cast(d18)).cast("double").as("syy"),
        sum(col("x").cast(d18) * col("y").cast(d18)).cast("double").as("sxy"))
      .select(col("g"), col("n_pairs"),
        expr("""CASE WHEN n_pairs*sxx - sx*sx = 0.0
                       OR n_pairs*syy - sy*sy = 0.0 THEN 0.0
                ELSE (n_pairs*sxy - sx*sy) /
                     (sqrt(n_pairs*sxx - sx*sx) * sqrt(n_pairs*syy - sy*sy))
                END""").as("r"))
  }

  /** Exponentially-weighted smoothing as a fixed-tap FIR filter:
    * `ewma_n = Σ_{j<taps} 2^(taps-1-j)·x_{n-j} / Σ 2^(taps-1-j)`
    * (α = 1/2, truncated at `taps` lags — the geometric tail beyond
    * 8 taps carries < 0.4% of the weight). Truncation is what makes
    * the operator scale-safe AND exact: the true IIR recurrence needs
    * either a sequential scan per series or numerically-explosive
    * `(1-α)^(-i)` prefix tricks, while the FIR form is `taps` lag
    * reads inside a per-entity window, with numerator/denominator
    * exact BIGINT sums (power-of-two weights on fixed-point cents)
    * and one final double division. Per-entity partitioned sort, no
    * global window.
    *
    * @return (entity, ord, v_cents, ewma)
    */
  def ewmaFir(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      valueCol: String,
      taps: Int = 8): DataFrame = {
    require(taps >= 1 && taps <= 62, s"taps out of range: $taps")
    val xq = floor(col(valueCol).cast("double") * 100).cast("long")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
    val terms = (0 until taps).map { j =>
      val weight = 1L << (taps - 1 - j)
      val x = if (j == 0) xq else lag(xq, j).over(w)
      (when(x.isNotNull, x * lit(weight)).otherwise(lit(0L)),
        when(x.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    events.select(
      col(entityCol),
      col(ordCol),
      xq.as("v_cents"),
      (num.cast("double") / den.cast("double")).as("ewma"))
  }

  /** Holt double-exponential smoothing (level + trend, α = β = 1/2)
    * per group, with an h-step-ahead linear forecast — the smallest
    * forecaster that tracks a trending series (plain EWMA lags a
    * ramp by a constant; Holt's trend term closes that gap).
    *
    * Recurrence (init l₁ = y₁, b₁ = 0):
    * `l_t = (y_t + l_{t-1} + b_{t-1}) / 2`,
    * `b_t = (l_t − l_{t-1} + b_{t-1}) / 2`; forecast = l_n + h·b_n.
    *
    * Unlike [[ewmaFir]] (which emits a value per ROW and therefore
    * must stay a fixed-tap window filter), the per-group END-state
    * fold is genuinely sequential — so it runs as one ordered
    * `aggregate` fold over the group's collected series. The
    * collect_list buffer is bounded by the series length (one
    * element per ORDER BUCKET, calendar-bounded after the daily
    * pre-aggregation the caller does), never by corpus size; the
    * fold is strictly left-to-right, so a mirrored fold is
    * bit-identical cross-engine with no dyadic constraint on the
    * inputs.
    *
    * @return (g, n_obs, level, trend, forecast)
    */
  def holtLinear(
      series: DataFrame,
      groupCol: Column,
      orderCol: Column,
      valueCol: Column,
      horizon: Int = 7): DataFrame = {
    series
      .groupBy(groupCol.as("g"))
      .agg(array_sort(collect_list(struct(orderCol.as("o"),
        valueCol.as("y")))).as("steps"))
      .select(col("g"), size(col("steps")).cast("long").as("n_obs"),
        expr(
          """aggregate(slice(steps, 2, size(steps) - 1),
               named_struct(
                 'l', CAST(element_at(steps, 1).y AS DOUBLE),
                 'b', CAST(0 AS DOUBLE)),
               (acc, x) -> named_struct(
                 'l', (CAST(x.y AS DOUBLE) + acc.l + acc.b) / 2,
                 'b', ((CAST(x.y AS DOUBLE) + acc.l + acc.b) / 2
                   - acc.l + acc.b) / 2))""").as("st"))
      .select(col("g"), col("n_obs"), col("st.l").as("level"),
        col("st.b").as("trend"),
        (col("st.l") + lit(horizon) * col("st.b")).as("forecast"))
  }

  /** Additive Holt-Winters (level + trend + period-p seasonality,
    * α = β = γ = 1/2) per group with a one-step-ahead forecast — the
    * [[holtLinear]] upgrade for series with a weekly shape: plain
    * Holt forecasts Monday from a Sunday-dominated level; the
    * seasonal term removes that bias.
    *
    * Recurrence (zero-seeded seasonals, l₁ = y₁, b₁ = 0; row t ≥ 2
    * reads/updates seasonal slot (t−1) mod p):
    * `l_t = ((y_t − s_slot) + l_{t−1} + b_{t−1}) / 2`,
    * `b_t = (l_t − l_{t−1} + b_{t−1}) / 2`,
    * `s_slot ← ((y_t − l_t) + s_slot) / 2`;
    * forecast₁ = l_n + b_n + s_{n mod p}. Zero seeding is part of
    * the operator contract (no lookahead pass), so early rows carry
    * the raw signal into the slots and the fit converges within a
    * few periods — exactly like the oracle's unrolled recursion.
    *
    * Like [[holtLinear]], the genuinely sequential fold runs as one
    * ordered `aggregate` over the group's collected series (bounded
    * by ORDER BUCKETS — calendar days — not corpus size); the slot
    * array is p doubles carried through the fold. Every arithmetic
    * step is mirrored token-for-token in the oracle's recursive CTE,
    * so the IEEE sequence — and the bits — match cross-engine.
    *
    * @return (g, n_obs, level, trend, s_next, forecast)
    */
  def holtWinters(
      series: DataFrame,
      groupCol: Column,
      orderCol: Column,
      valueCol: Column,
      period: Int = 7): DataFrame = {
    require(period >= 2, "period must be at least 2")
    val p = period
    // l_t appears inside b_t and s_t: the lambda has no let-binding,
    // so the expression repeats — the oracle repeats it identically.
    val lt = s"""((CAST(x.y AS DOUBLE)
        - element_at(acc.s, CAST(acc.i % $p AS INT) + 1))
        + acc.l + acc.b) / 2"""
    series
      .groupBy(groupCol.as("g"))
      .agg(array_sort(collect_list(struct(orderCol.as("o"),
        valueCol.as("y")))).as("steps"))
      .select(col("g"), size(col("steps")).cast("long").as("n_obs"),
        expr(
          s"""aggregate(slice(steps, 2, size(steps) - 1),
               named_struct(
                 'i', CAST(1 AS BIGINT),
                 'l', CAST(element_at(steps, 1).y AS DOUBLE),
                 'b', CAST(0 AS DOUBLE),
                 's', array_repeat(CAST(0 AS DOUBLE), $p)),
               (acc, x) -> named_struct(
                 'i', acc.i + 1,
                 'l', $lt,
                 'b', ($lt - acc.l + acc.b) / 2,
                 's', transform(acc.s, (sv, si) ->
                   IF(si = CAST(acc.i % $p AS INT),
                     ((CAST(x.y AS DOUBLE) - $lt) + sv) / 2,
                     sv))))""").as("st"))
      .select(col("g"), col("n_obs"), col("st.l").as("level"),
        col("st.b").as("trend"),
        expr(s"element_at(st.s, CAST(n_obs % $p AS INT) + 1)")
          .as("s_next"))
      .withColumn("forecast",
        expr("level + trend + s_next"))
  }

  /** Per-day sMAPE term over exact integer (actual, forecast) —
    * shared token-for-token with the oracle ([[forecastBacktest]]).
    */
  val SmapeTerm: String =
    """CASE WHEN CAST(x.y AS DOUBLE) + CAST(x.f AS DOUBLE) = 0.0
       THEN 0.0
       ELSE 2.0*abs(CAST(x.y AS DOUBLE) - CAST(x.f AS DOUBLE))
            /(CAST(x.y AS DOUBLE) + CAST(x.f AS DOUBLE))
       END"""

  /** Closing mean for [[forecastBacktest]]. */
  val SmapeExpr: String =
    "CASE WHEN n_days = 0 THEN NULL ELSE ssum/CAST(n_days AS DOUBLE) END"

  /** Forecast backtest: hold out the days from `splitDay` on and
    * score the two standard baselines per group — naive (last
    * training value) and seasonal-naive (value `season` days
    * earlier) — by sMAPE. The honesty gate for fancier forecasters:
    * a Holt/Holt-Winters model that can't beat seasonal-naive on the
    * backtest is mis-specified, and the baseline table is the
    * readout that says so.
    *
    * Exactness: actuals and both forecasts are exact integers (the
    * naive forecast is an argmax struct read, seasonal-naive an
    * equi-join on the shifted calendar day); each day's sMAPE term
    * is one double expression over those integers and the mean folds
    * over the horizon-bounded test frame SORTED by day
    * ([[SmapeTerm]]/[[SmapeExpr]] token-shared with the oracle).
    *
    * Scale shape: one hash aggregation to the daily frame (caller
    * supplies it pre-aggregated), argmax + shifted self-join on that
    * CALENDAR-bounded frame, one closing fold per (group, method).
    * Test days whose seasonal lag is absent from the daily frame drop
    * from BOTH methods (inner join), keeping the comparison paired.
    *
    * @return (g, method, n_days, smape)
    */
  def forecastBacktest(
      daily: DataFrame,
      gCol: Column,
      tCol: Column,
      yCol: Column,
      splitDay: String,
      season: Int = 7): DataFrame = {
    val base = daily.select(gCol.as("g"), tCol.as("t"), yCol.as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val split = lit(splitDay).cast("date")
    val lastTrain = base.filter(col("t") < split)
      .groupBy("g")
      .agg(max(struct(col("t"), col("y"))).as("m"))
      .select(col("g"), col("m.y").as("naive_f"))
    val seasonal = base.select(col("g"),
      date_add(col("t"), season).as("t"), col("y").as("snaive_f"))
    base.filter(col("t") >= split)
      .join(lastTrain, Seq("g"))
      .join(seasonal, Seq("g", "t"))
      .selectExpr("g", "t", "y",
        "stack(2, 'naive', naive_f, 'snaive', snaive_f) AS (method, f)")
      .groupBy(col("g"), col("method"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("t"), col("y"), col("f"))))
          .as("pts"))
      .select(col("g"), col("method"), col("n_days"),
        expr(s"""aggregate(pts, CAST(0 AS DOUBLE),
            (a, x) -> a + ($SmapeTerm))""").as("ssum"))
      .select(col("g"), col("method"), col("n_days"),
        expr(SmapeExpr).as("smape"))
  }

  /** Exact rolling median of an integral series per group: the
    * robust trailing-window smoother (a single spike moves a rolling
    * mean by spike/width but the median not at all). Window rows are
    * collected into a bounded array (≤ `width` elements), sorted, and
    * read at the discrete median position ⌈len/2⌉ — all integer
    * expressions, so cross-engine exact. Early rows smooth over the
    * shorter available prefix, matching the SQL frame semantics.
    *
    * Scale shape: one window pass partitioned by group over the
    * CALENDAR-bounded series frame (callers pass pre-aggregated
    * daily/hourly points, one row per period); the collected buffer
    * is `width` longs.
    *
    * @return input columns (g, t, y) plus roll_med
    */
  def rollingMedian(
      df: DataFrame,
      gCol: Column,
      tCol: Column,
      yCol: Column,
      width: Int = 7): DataFrame = {
    require(width >= 1, "window width must be positive")
    val win = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(-(width - 1), 0)
    df.select(gCol.as("g"), tCol.as("t"), yCol.as("y"))
      .withColumn("buf", sort_array(collect_list(col("y")).over(win)))
      .select(col("g"), col("t"), col("y"),
        expr("element_at(buf, CAST((size(buf) + 1) div 2 AS INT))")
          .as("roll_med"))
  }
}
