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

    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(col) ++
        payload.map(p => lit(null).as(s"__p_$p")) ++
        tie.map(_ => lit(null).cast("long").as("__tie")): _*)

    val taggedRight = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"__p_$p")) ++
        tie.map(t => col(t).cast("long").as("__tie")): _*)

    val orderCols: Seq[Column] =
      Seq(col("__t").asc, col("__tag").asc) ++
        (if (tie.nonEmpty) Seq(col("__tie").asc_nulls_first) else Nil)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, p) => df.withColumn(p + "_asof",
        last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(p + "_asof")): _*)
  }
}
