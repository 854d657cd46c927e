package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence mining over per-entity event streams: Markov transition
  * counts and marketing-style touch attribution. Extends the
  * reference's flat per-PR event handling (SURVEY.md §2 has no
  * ordering-dependent operator at all) with the order-aware layer an
  * event log actually gets queried with.
  *
  * Scale shape (both operators): ONE window partitioned by the entity
  * — each series sorts inside its own partition, parallelism is the
  * key cardinality, no global sort — followed by an ordinary
  * partial-combining hash aggregation (transitions) or a filter
  * (attribution). Everything downstream of the window carries
  * entity-count-×-small rows.
  *
  * Determinism: series order is the unique (ts, ord) pair; transition
  * probabilities are fixed-point parts-per-million via integer floor
  * division (no float ratios to disagree on); attribution picks
  * touches via min/max over (ts, ord, ...) structs — order-free and
  * hash-verifiable cross-engine.
  */
object Sequences {

  /** First-order Markov transition matrix of `attrCol` over each
    * entity's (ts, ord)-ordered stream: counts of consecutive
    * (from → to) pairs across ALL entities, with the per-from
    * transition probability as exact integer parts-per-million.
    *
    * The probability normalization happens on the AGGREGATED frame
    * (|states|² rows), so the second window is over a frame that
    * stays tiny no matter how large the input — never over events.
    *
    * @return (src, dst, cnt, p_ppm)
    */
  def transitionCounts(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
    val pairs = events
      .select(col(attrCol).as("from"),
        lead(col(attrCol), 1).over(w).as("to"))
      .filter(col("to").isNotNull)
    pairs
      .groupBy(col("from"), col("to"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("from_total",
        sum(col("cnt")).over(Window.partitionBy(col("from"))))
      .select(col("from").as("src"), col("to").as("dst"), col("cnt"),
        expr("(1000000 * cnt) div from_total").as("p_ppm"))
  }

  /** First- and last-touch attribution: for every conversion event,
    * the earliest and the most recent preceding touch event of the
    * same entity (strictly before the conversion in (ts, ord) order),
    * null when no touch precedes. The running min/max over
    * conditional (ts, ord) structs needs no join back to the touch
    * stream — one window pass emits both attributions.
    *
    * @return (entity, conversion ord, conversion ts, first_touch,
    *          last_touch) — touch columns are the touch's ord id.
    */
  def touchAttribution(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      attrCol: String,
      touchValue: String,
      conversionValue: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch: Column = when(col(attrCol) === lit(touchValue),
      struct(col(tsCol).as("t"), col(ordCol).as("i")))
    events
      .select(col(entityCol), col(tsCol), col(ordCol), col(attrCol),
        min(touch).over(w).as("ft"),
        max(touch).over(w).as("lt"))
      .filter(col(attrCol) === lit(conversionValue))
      .select(col(entityCol),
        col(ordCol).as("conversion_id"),
        col(tsCol).as("conversion_ts"),
        col("ft").getField("i").as("first_touch"),
        col("lt").getField("i").as("last_touch"))
  }

  /** Top-k entity journeys: the most common length-`steps` opening
    * paths (first `steps` attribute values of each entity's (ts, ord)
    * stream, joined with `>`), counted across entities — the "what do
    * users actually do first" path-mining read-out that pairwise
    * [[transitionCounts]] can't answer (paths are order-sensitive
    * beyond one hop). Entities with fewer than `steps` events are
    * excluded (their truncated path isn't comparable).
    *
    * Shape: the per-entity window keeps only the first `steps` rows
    * (filter directly on row_number — the shuffle after it carries
    * ≤ steps rows per entity), path assembly is an order-free
    * sort-by-ordinal fold inside one hash aggregation, and the final
    * top-k is TakeOrdered with the path string as tie-break.
    *
    * @return (path, n_entities), top `k` by count desc, path asc
    */
  def topPaths(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      ordCol: String,
      attrCol: String,
      steps: Int = 3,
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(ordCol))
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= steps)
      .groupBy(col(entityCol))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("_rn"), col(attrCol).as("a")))),
          x => x.getField("a"))).as("path"),
        count(lit(1)).as("_n"))
      .filter(col("_n") === steps.toLong)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path"))
      .limit(k)
  }

  /** Time-decayed engagement score per entity with a ONE-DAY
    * half-life, kept exact: an event aged `d` calendar days at
    * `asofDate` weighs `2^(horizon − d)` (zero beyond the horizon),
    * so the per-entity fold is an exact integer sum and the score is
    * one final division by `2^horizon` — recency weighting with no
    * float exp() anywhere (dyadic weights are why the half-life is
    * pinned to one day, the same exactness-pins-the-parameter choice
    * as the α=1/2 temperature mix and EWMA taps). The horizon (40
    * days ≈ weight 1e-12) bounds both the truncation error and the
    * sum's magnitude: n·2^40 stays far inside 2^63 for any real
    * per-entity event count.
    *
    * ONE order-free hash aggregation; the asof date is a plan
    * literal, so the age arithmetic is a per-row projection.
    *
    * @return (entity, n_events, w_sum, score) — score = w_sum/2^40,
    *         1.0 ≈ one event today.
    */
  def decayedEngagement(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      asofDate: String,
      horizonDays: Int = 40): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 62, s"horizon: $horizonDays")
    val age = datediff(lit(asofDate).cast("date"), col(tsCol).cast("date"))
    val w = when(age.between(0, horizonDays),
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST($horizonDays - " +
        s"datediff(CAST('$asofDate' AS DATE), CAST(${tsCol} AS DATE)) AS INT))"))
      .otherwise(lit(0L))
    events
      .groupBy(col(entityCol).as("entity"))
      .agg(count(lit(1)).as("n_events"), sum(w).as("w_sum"))
      .select(col("entity"), col("n_events"), col("w_sum"),
        (col("w_sum").cast("double") /
          lit(math.pow(2.0, horizonDays))).as("score"))
  }

  /** Collapse consecutive repeats: keep each event only when its type
    * differs from the user's immediately preceding event — the
    * bot-retry / double-fire scrub that turns raw click logs into
    * transition-clean sequences ([[transitionCounts]] and
    * [[topPaths]] assume this has happened; self-loops otherwise
    * dominate both). One lag window per user (the ordering exchange
    * those downstream ops need anyway), deterministic under the
    * (ts, tiebreak) order.
    *
    * @return (user_id, ts_s epoch-seconds, event_type) — the kept rows
    */
  def collapseRuns(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("prev", lag(col(typeCol), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col(typeCol))
      .select(col(userCol).as("user_id"),
        col(tsCol).cast("timestamp").cast("long").as("ts_s"),
        col(typeCol).as("event_type"))
  }
}
