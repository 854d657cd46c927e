package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null/NDV counts,
  * min/max, and total string length, computed in ONE pass over the
  * table — the statistics collection a catalog runs before an
  * optimizer can cost joins, and the first report a data engineer
  * pulls on an unfamiliar 100 TB table.
  *
  * Scale shape: a single aggregation; the multi-column exact
  * `count(distinct)` plans as Catalyst's Expand (one input row fans
  * out once per profiled column pre-shuffle, each carrying only that
  * column's value), so the shuffle moves partial aggregates, never
  * rows. The per-column result pivot (`stack`) runs on the one
  * aggregated row. Profiling k columns therefore costs one scan +
  * one k-way Expand — not k scans. For tables where exact NDV's
  * Expand is too hot, the KMV/HLL sketches
  * ([[graft.functions.KmvSketch]], `approx_count_distinct`) are the
  * drop-in cheaper NDV; this operator is the exact-answer variant.
  *
  * Determinism: min/max are computed on the NATIVE type and cast to
  * string after (so numeric columns order numerically), which
  * round-trips identically in DuckDB for longs, decimals, and
  * pre-formatted date strings — the caller pre-projects columns to
  * those deterministic types, mirroring the oracle discipline used
  * throughout `graft.queries`.
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nulls,
    * n_distinct, min_str, max_str, total_strlen). `n_distinct`
    * excludes nulls; `total_strlen` sums string-cast lengths with
    * nulls contributing 0.
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    def nn(c: String): Column = sum(when(col(c).isNull, 1L).otherwise(0L))
    // TWO single-row aggregations, cross-joined: a string-typed
    // min/max buffer disqualifies HashAggregate, and fused with the
    // NDVs that sort-agg fallback would SORT the k-way Expand output
    // on string keys (measured 4× the whole profile's cost). Split,
    // the NDV Expand keeps pure long buffers (hash agg) and the
    // min/max pass is an ungrouped fold — the sorts vanish.
    val ndvAggs: Seq[Column] =
      cols.map(c => countDistinct(col(c)).as(s"__ndv_$c"))
    val foldAggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        nn(c).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        sum(coalesce(length(col(c).cast("string")), lit(0)).cast("long"))
          .as(s"__len_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(foldAggs.head, foldAggs.tail: _*)
      .crossJoin(broadcast(df.agg(ndvAggs.head, ndvAggs.tail: _*)))
    val stacked = cols.map { c =>
      s"'$c', __n, __nulls_$c, __ndv_$c, __min_$c, __max_$c, __len_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str, total_strlen)"))
  }

  /** χ² contingency cells for two categorical columns — the
    * feature-selection / independence screen (is language correlated
    * with quality bucket?) over a labeled corpus. Returns the FULL
    * a×b grid (zero-observation cells included — they carry χ² mass)
    * with exact integer evidence and the one float at the end:
    * (a, b, obs, row_total, col_total, n_total,
    * chi_term = (n·obs − r·c)² / (n·r·c)), so Σ chi_term = χ².
    *
    * Determinism: all counts are exact longs; the squared numerator
    * is exact decimal(38) (n·obs−r·c can reach n², whose square
    * overflows a long); each cell's term is ONE double division of
    * two exactly-rounded doubles — bit-stable under any partitioning
    * and replicated verbatim in the oracle.
    *
    * Scale shape: one hash agg over the table to cell counts; row and
    * column totals re-aggregate the CELL frame (|a|·|b| rows, not
    * corpus rows); the grid is a cross join of the two tiny marginal
    * frames.
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy("a").agg(sum(col("obs")).as("row_total"))
    val colT = cells.groupBy("b").agg(sum(col("obs")).as("col_total"))
    val total = cells.agg(sum(col("obs")).as("n_total"))
    val diff = col("n_total") * col("obs") - col("row_total") * col("col_total")
    rowT.crossJoin(colT).crossJoin(broadcast(total))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("__d", diff)
      .select(
        col("a"), col("b"), col("obs"),
        col("row_total"), col("col_total"), col("n_total"),
        ((col("__d").cast("decimal(38,0)") * col("__d")).cast("double") /
          (col("n_total") * col("row_total") * col("col_total")).cast("double"))
          .as("chi_term"))
  }

  /** Shared Spark↔oracle closing expression for [[cramersV]]. */
  val CvExpr: String =
    """CASE WHEN r < 2 OR c < 2 OR n = 0 THEN NULL
       ELSE sqrt(chi2 / (CAST(n AS DOUBLE)
                         * CAST(least(r, c) - 1 AS DOUBLE)))
       END"""

  /** Cramér's V effect size on top of [[chiSquareCells]]: the
    * [0,1]-normalized strength of association between two categorical
    * columns — χ² says "dependent", V says "how much", comparably
    * across grids of different shape. The χ² total folds over the
    * CELL frame sorted by (a, b) (bounded |a|·|b| rows), so the
    * double sum is order-deterministic and token-shared with the
    * oracle ([[CvExpr]]); everything data-sized already happened in
    * the one cell aggregation.
    *
    * @return 1 row: (r, c, n, chi2, cramers_v)
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquareCells(df, aCol, bCol)
      .agg(
        count_distinct(col("a")).as("r"),
        count_distinct(col("b")).as("c"),
        max(col("n_total")).as("n"),
        sort_array(collect_list(struct(col("a"), col("b"), col("chi_term"))))
          .as("cs"))
      .select(col("r"), col("c"), col("n"),
        expr("""aggregate(cs, CAST(0 AS DOUBLE),
            (acc, x) -> acc + x.chi_term)""").as("chi2"))
      .select(col("r"), col("c"), col("n"), col("chi2"),
        expr(CvExpr).as("cramers_v"))
}
