package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fifth operator pack: censoring-honest survival curves,
  * trend-aware forecasting, and certified one-pass heavy hitters —
  * the "how is the pipeline trending and what dominates it" layer on
  * top of the evaluation pack ([[EvalQueries]]).
  *
  * Oracle-parity discipline: exact integer life tables and counts;
  * every double is produced by a strictly LEFT-TO-RIGHT sequential
  * fold whose element expressions are mirrored token-for-token in
  * the DuckDB twin (`aggregate(slice(...), init, ...)` ↔
  * `list_reduce(list_prepend(init, ...))`), so the IEEE operation
  * sequence — and hence the bits — are identical cross-engine with
  * no dyadic constraint on the inputs.
  *
  * Scale notes: each query's data-sized stages are per-key hash
  * aggregations; the sequential folds run over CALENDAR-bounded
  * frames (one element per day) in the one-row collected domain.
  * The Misra-Gries pass is the deliberate exception that carries its
  * own certificate: k counters of state however large the key
  * domain, priced against exact truth in the output itself.
  */
object StatQueries {

  /** Misra-Gries capacity for `q_heavy_hitters` (19 live keys at the
    * default transform, so decay genuinely triggers).
    */
  private val MgK = 8

  /** Zipf-surrogate key over the uniform synthetic events: for g
    * uniform on 0..99, floor(100/(1+g)) has harmonic mass (top key
    * ~50%, next ~17%, ...) — the shape real term/entity frequencies
    * take. Shared token-for-token with the DuckDB twin (floor before
    * any cast; positive operands only, so `%` agrees cross-engine).
    */
  private val ZipfKeyExpr: String =
    """concat('k', CAST(CAST(floor(100 / (1 + (CAST(floor(value * 100)
       AS BIGINT) % 100))) AS BIGINT) AS STRING))"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Kaplan-Meier time-to-conversion: first view -> first purchase
    // in calendar days, censored at the frame's last event date.
    // The censoring-honest counterpart of q_conversion_lag: subjects
    // that never purchased stay in the at-risk denominator until
    // their censoring day instead of being silently dropped. Two
    // user-keyed aggregations + a 1-row horizon broadcast are the
    // only data-sized stages; the life table is calendar-bounded.
    "q_kaplan_meier" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Survival.kaplanMeier(ev, col("ts"), col("user_id"),
        col("event_type") === "view", col("event_type") === "purchase")
    }),

    // Holt double-exponential level+trend forecast of daily event
    // volume per type (alpha = beta = 1/2, 7-day-ahead linear
    // forecast). The daily pre-aggregation is the one data-sized
    // stage; the per-type fold runs over the calendar-bounded daily
    // series.
    "q_holt_forecast" -> ((s, d) =>
      graft.ops.Timeseries.holtLinear(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"), horizon = 7)
        .withColumnRenamed("g", "event_type")),

    // Certified Misra-Gries heavy hitters over a Zipf-surrogate key:
    // the one-pass k-counter summary, priced against exact truth.
    // Output rows are the TRUE heavy hitters (exact count > n/(k+1),
    // deterministic); `found` / `within_bound` certify the theorems
    // the sketch must satisfy under ANY partitioning (candidate
    // presence; 0 <= true - est <= n/(k+1)) — raw estimates are
    // partition-dependent and never emitted (the q_bloom_fpr
    // discipline). The exact 19-key groupBy exists here only to
    // price the sketch; the production path is the MG pass alone.
    "q_heavy_hitters" -> ((s, d) => {
      val keyed = Tables.events(s, d).select(expr(ZipfKeyExpr).as("kk"))
        .persist()
      val exact = keyed.groupBy("kk").agg(count(lit(1)).as("cnt"))
      val mg = keyed.agg(
        graft.functions.MisraGries.mgSummary(MgK)(col("kk"))
          .as("summary"))
      val tot = exact.agg(sum("cnt").as("n"))
      exact.crossJoin(broadcast(tot))
        .filter(col("cnt") * (MgK + 1) > col("n"))
        .crossJoin(broadcast(mg))
        .select(col("kk"), col("cnt"), col("n"),
          expr("exists(summary, p -> p._1 = kk)").as("found"),
          expr(s"""exists(summary, p -> p._1 = kk AND p._2 <= cnt
            AND (cnt - p._2) * ${MgK + 1} <= n)""").as("within_bound"))
    }))

  val oracleSql: Map[String, String] = Map(

    "q_kaplan_meier" ->
      """WITH fv AS (SELECT user_id, min(ts) AS b FROM events
            WHERE event_type = 'view' GROUP BY 1),
          dv AS (SELECT e.user_id, min(e.ts) AS dt
            FROM events e JOIN fv USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= fv.b GROUP BY 1),
          hz AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
          coh AS (SELECT CAST(CASE WHEN d.dt IS NULL
                THEN date_diff('day', CAST(f.b AS DATE), h.h)
                ELSE date_diff('day', CAST(f.b AS DATE), CAST(d.dt AS DATE))
                END AS BIGINT) AS t,
              CASE WHEN d.dt IS NULL THEN 0 ELSE 1 END AS obs
            FROM fv f LEFT JOIN dv d USING (user_id), hz h),
          agg AS MATERIALIZED (SELECT t, CAST(sum(obs) AS BIGINT) AS d,
              CAST(sum(1 - obs) AS BIGINT) AS c FROM coh GROUP BY 1),
          tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS ntot FROM agg),
          st AS MATERIALIZED (SELECT t, d, c,
              ROW_NUMBER() OVER (ORDER BY t) AS rn,
              ntot - COALESCE(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
            FROM agg, tot),
          fs AS (SELECT list(CAST(1 AS DOUBLE)
              - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY t) AS l
            FROM st)
          SELECT s.t, s.d, s.c, CAST(s.n AS BIGINT) AS n,
            list_reduce(list_prepend(CAST(1 AS DOUBLE),
              list_slice(f.l, 1, s.rn)), (a, b) -> a * b) AS surv
          FROM st s, fs f""",

    // NOTE: the sequential (l, b) state fold is mirrored as a
    // recursive CTE, NOT a list_reduce with a struct accumulator —
    // DuckDB 1.0's list_reduce mis-evaluates struct-valued
    // accumulators (scalar accumulators, as in q_kaplan_meier, are
    // fine). The recursion applies the recurrence one row at a time
    // in rn order — the same IEEE operation sequence as Spark's
    // ordered `aggregate` fold.
    "q_holt_forecast" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
            SELECT event_type, CAST(count(*) AS BIGINT) AS y,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY CAST(ts AS DATE)) AS rn
            FROM events GROUP BY event_type, CAST(ts AS DATE)),
          nn AS MATERIALIZED (SELECT event_type,
              CAST(max(rn) AS BIGINT) AS n_obs
            FROM daily GROUP BY 1),
          fold AS (
            SELECT event_type, rn, CAST(y AS DOUBLE) AS l,
              CAST(0 AS DOUBLE) AS b
            FROM daily WHERE rn = 1
            UNION ALL
            SELECT d.event_type, d.rn,
              (CAST(d.y AS DOUBLE) + f.l + f.b) / 2,
              ((CAST(d.y AS DOUBLE) + f.l + f.b) / 2 - f.l + f.b) / 2
            FROM fold f JOIN daily d
              ON d.event_type = f.event_type AND d.rn = f.rn + 1)
          SELECT f.event_type, n.n_obs, f.l AS level, f.b AS trend,
            f.l + 7 * f.b AS forecast
          FROM fold f JOIN nn n
            ON f.event_type = n.event_type AND f.rn = n.n_obs""",

    "q_heavy_hitters" ->
      """WITH k AS (SELECT concat('k', CAST(CAST(floor(100 / (1 +
              (CAST(floor(value * 100) AS BIGINT) % 100))) AS BIGINT)
              AS VARCHAR)) AS kk FROM events),
          c AS MATERIALIZED (SELECT kk, CAST(count(*) AS BIGINT) AS cnt
            FROM k GROUP BY 1),
          t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
          SELECT kk, cnt, n, TRUE AS found, TRUE AS within_bound
          FROM c, t WHERE cnt * 9 > n""")
}
