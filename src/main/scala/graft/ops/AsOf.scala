package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the latest right
  * row whose time is ≤ the left row's time, per join key.
  *
  * Spark has no native as-of join; per the extension ladder this is
  * case (a) — built-ins express the semantics exactly — so it is
  * composed from a union + window carry-forward rather than a custom
  * physical operator:
  *
  *   1. tag right rows 0 and left rows 1, union them on
  *      (key, time, tag);
  *   2. one window per key ordered by (time, tag): `last(payload,
  *      ignoreNulls)` over unbounded-preceding..current carries the
  *      most recent right payload forward (tag order puts a
  *      same-timestamp right row BEFORE the left row, giving ≤
  *      semantics);
  *   3. keep the left rows.
  *
  * Scale shape: ONE shuffle on the key + a per-partition sort — no
  * range cross-products, no per-row binary search structure, and skew
  * handling falls out of AQE like any other exchange. This is the
  * standard formulation for billion-row as-of joins.
  *
  * Determinism: among right rows with identical (key, time), window
  * order is tie-broken by `rightTieBreaker` if given; with payloads
  * that are functions of (key, time) only, ties cannot change the
  * result.
  *
  * The payload is carried as ONE struct per right row (null for left
  * rows), so the match is atomic: a right row whose payload field is
  * null yields null for that field — `last(field, ignoreNulls)`
  * per-column would instead resurrect an older row's value and could
  * emit a composite row that never existed.
  */
object AsOf {

  def joinBackward(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreaker: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val tie = rightTieBreaker.toSeq

    val payloadSchema = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))

    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(payloadSchema).as("__p")) ++
        tie.map(t => lit(null).cast(right.schema(t).dataType).as("__tie")): _*)

    // SQL join equality is never true for NULL keys, and "time <= t"
    // is never true for NULL times: drop both kinds of right rows up
    // front (a NULL time would otherwise sort NULLS FIRST and its
    // payload would be carried into rows with no real match).
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__p")) ++
        tie.map(t => col(t).as("__tie")): _*)

    val orderCols: Seq[Column] =
      Seq(col("__t").asc, col("__tag").asc) ++
        (if (tie.nonEmpty) Seq(col("__tie").asc_nulls_first) else Nil)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__match.$p").as(p + "_asof")): _*)
  }

  /** NEAREST as-of join: attach the right row temporally CLOSEST to
    * each left row (either direction), ties to the earlier (backward)
    * match — the sensor-alignment semantic where "latest before" is
    * wrong half the time. Same union shape as [[joinBackward]] with
    * BOTH carries: the backward window's `last(ignoreNulls)` and the
    * forward window's `first(ignoreNulls)` share one partitioning and
    * one sort, so Catalyst plans ONE exchange + sort for both (a
    * same-timestamp right row sorts before the left row and is
    * carried by the backward side at distance 0, which wins every
    * tie).
    *
    * Distances are floored epoch seconds (the cross-engine timestamp
    * convention). Among right rows tied on (key, time) the carried
    * payload must be a function of (key, time) — same caveat as
    * [[joinBackward]] without a tie-breaker.
    *
    * @return left columns ++ payload columns as `<p>_near` ++
    *         `near_dist_s` (null when the key has no right rows)
    */
  def joinNearest(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val pSchema = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)) :+
        org.apache.spark.sql.types.StructField(
          "__rt", org.apache.spark.sql.types.LongType))

    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(pSchema).as("__p")): _*)
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col) :+
          col(rightTime).cast("timestamp").cast("long").as("__rt"): _*)
          .as("__p")): _*)

    val order = Seq(col("__t").asc, col("__tag").asc)
    val wb = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tl = col("__t").cast("timestamp").cast("long")
    val chosen =
      when(col("__b").isNull && col("__f").isNull,
        lit(null).cast(pSchema))
        .when(col("__f").isNull, col("__b"))
        .when(col("__b").isNull, col("__f"))
        .when(tl - col("__b.__rt") <= col("__f.__rt") - tl, col("__b"))
        .otherwise(col("__f"))

    taggedLeft.unionByName(taggedRight)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wf))
      .filter(col("__tag") === 1)
      .withColumn("__m", chosen)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(p + "_near")) :+
        abs(col("__m.__rt") - tl).as("near_dist_s"): _*)
  }
}
