package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Cohorts, Dedup, Intervals, Moments, Profile, StatTests,
  TextOps, Timeseries, Winnow}

/** Seventh operator pack: the k-group hypothesis-test family (ANOVA,
  * Kruskal-Wallis, Jarque-Bera, Cramér's V), interval coalescing,
  * exact modes, and two corpus fingerprint/scrub operators
  * (winnowing, per-source boilerplate removal).
  *
  * Oracle-parity discipline as established ([[StatQueries]] header):
  * exact integer/decimal sufficient statistics, order-deterministic
  * sorted folds for k-row double sums, every closing double
  * expression token-shared with the DuckDB twin. Timestamps cross
  * the engines as floored epoch SECONDS (Spark `cast(long)` ↔ DuckDB
  * `floor(epoch(...))`), positions/hashes as BIGINT, divisions as
  * positive-operand `div`/`//`.
  */
object AnalyticsQueries {

  /** Shared Spark↔oracle expressions for q_sample_size: base rate,
    * absolute MDE at 5% relative, and the two-proportion n per arm
    * (z_{.975}=1.96, z_{.80}=0.84 as the standard literals).
    */
  private val SampleSizeExprs: (String, String, String) = (
    "CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE)",
    "0.05*(CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE))",
    """CASE WHEN n_success = 0 THEN NULL
       ELSE ceil(2.0*(1.96 + 0.84)*(1.96 + 0.84)
         *(CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE))
         *(1.0 - CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE))
         /((0.05*(CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE)))
           *(0.05*(CAST(n_success AS DOUBLE)/CAST(n_events AS DOUBLE)))))
       END""")

  /** Wald SPRT log-likelihood ratio for p0=.19 vs p1=.21, shared
    * Spark↔oracle (both engines' ln are correctly rounded on these
    * operands — the q_entropy convention).
    */
  private val SprtLlrExpr: String =
    """CAST(s_cum AS DOUBLE)
       *ln(CAST(0.21 AS DOUBLE)/CAST(0.19 AS DOUBLE))
       + (CAST(n_cum AS DOUBLE) - CAST(s_cum AS DOUBLE))
         *ln((CAST(1 AS DOUBLE) - CAST(0.21 AS DOUBLE))
             /(CAST(1 AS DOUBLE) - CAST(0.19 AS DOUBLE)))"""

  /** SPRT decision at the symmetric ln(19) boundaries. */
  private val SprtDecisionExpr: String =
    """CASE WHEN llr >= ln(CAST(19 AS DOUBLE)) THEN 'accept_h1'
       WHEN llr <= -ln(CAST(19 AS DOUBLE)) THEN 'accept_h0'
       ELSE 'continue' END"""

  /** Whitespace-token expr shared by the documents oracles. */
  private val ws =
    "list_filter(string_split(COALESCE(text, ''), ' '), w -> w <> '')"

  /** Portable word hash (TextOps.wordHash twin), BIGINT. */
  private def wh(w: String): String =
    s"(length($w)*10007 + ord(substr($w,1,1))*101 + ord(substr($w,-1,1)))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // One-way ANOVA F: does mean event value differ by event type?
    // Exact cent power sums per group; the closing F assembles over
    // the k-row group frame (see StatTests.anovaF).
    "q_anova_f" -> ((s, d) =>
      StatTests.anovaF(Tables.events(s, d), "event_type",
        floor(col("value") * 100).cast("long"))),

    // Kruskal-Wallis H: nonparametric k-group location test on
    // quantity by return flag — pooled tie-averaged ranks as exact
    // doubled integers over the distinct-value frame.
    "q_kruskal" -> ((s, d) =>
      StatTests.kruskalWallis(Tables.lineitem(s, d), "l_returnflag",
        floor(col("l_quantity")).cast("long"))),

    // Jarque-Bera normality per return flag, assembled on the
    // q_moments exact power sums (zero extra passes).
    "q_jarque_bera" -> ((s, d) =>
      Moments.jarqueBera(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity")),

    // Cramér's V: strength of the (event type × time-of-day
    // quadrant) association — the effect size on the q_chisq grid.
    "q_cramers_v" -> ((s, d) =>
      Profile.cramersV(
        Tables.events(s, d).select(
          col("event_type"), expr("hour(ts) div 6").as("quad")),
        "event_type", "quad")),

    // Interval coalescing: merge each user's overlapping activity
    // spans [ts, ts + 60..599 s) into maximal islands. Variable
    // durations (from the value column) make the running-max island
    // test genuinely necessary — a long span swallows short ones.
    "q_merge_intervals" -> ((s, d) => {
      val sec = col("ts").cast("timestamp").cast("long")
      Intervals.mergeIntervals(Tables.events(s, d),
        col("user_id"), sec,
        sec + lit(60L) + floor(col("value") * 100).cast("long") % 540L,
        col("event_id"))
        .select(col("k").as("user_id"), col("island"),
          col("start").as("start_s"), col("end").as("end_s"),
          col("n_merged"))
    }),

    // Exact per-group mode: most frequent quantity per return flag,
    // ties to the LARGEST value — one counts agg + one struct-max
    // agg, both hash-based and partial-combining (no window, no
    // sort; the [A1] argmax discipline).
    "q_mode" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          floor(col("l_quantity")).cast("long").as("v"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("c"), col("v"))).as("m"))
        .select(col("l_returnflag"),
          col("m.v").as("mode_qty"), col("m.c").as("n_mode"))),

    // Per-source boilerplate scrub: 4-word lines occurring in >1
    // distinct documents of the SAME source are template, not
    // content — drop every copy (C4-style), rebuild clean text.
    "q_boilerplate" -> ((s, d) => {
      val toks = TextOps.words(col("text"))
      val lined = Tables.documents(s, d).select(
        col("doc_id"), col("source"),
        when(size(toks) === 0, lit(""))
          .otherwise(array_join(
            transform(
              sequence(lit(0),
                floor((size(toks) + lit(3)) / lit(4.0)).cast("int") - 1),
              i => array_join(slice(toks, i * 4 + 1, lit(4)), " ")),
            "\n")).as("text"))
      Dedup.boilerplateScrub(lined, "doc_id", "text", "source", maxDf = 1)
        .withColumnRenamed("grp", "source")
    }),

    // Winnowing (MOSS) fingerprints: per 4-window of word-3-gram
    // hashes keep the rightmost minimum — bounded-density positional
    // fingerprints with the shared-substring guarantee.
    "q_winnowing" -> ((s, d) =>
      Winnow.fingerprints(Tables.documents(s, d), "doc_id", "text",
        k = 3, w = 4)
        .withColumnRenamed("id", "doc_id")),

    // Overlap-candidate pairs on those fingerprints: documents
    // sharing >= 2 selected hashes (quotation/plagiarism evidence),
    // grouped posting-list pair generation, df-cut boilerplate.
    "q_winnow_pairs" -> ((s, d) =>
      Winnow.overlapPairs(Tables.documents(s, d), "doc_id", "text",
        k = 3, w = 4, minShared = 2)),

    // Exact rolling 7-day median of daily volume per event type —
    // the robust smoother over the calendar-bounded daily frame.
    "q_rolling_median" -> ((s, d) =>
      Timeseries.rollingMedian(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"), width = 7)
        .select(col("g").as("event_type"), col("t").as("day"),
          col("y"), col("roll_med"))),

    // RFM segmentation of purchasers: exact quintile scores via
    // cumDist rank reads (no global NTILE sort), recency inverted so
    // 5 = best on every axis.
    "q_rfm" -> ((s, d) =>
      Cohorts.rfm(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", floor(col("value") * 100), "2024-02-01")),

    // Per-user purchase rate shrunk toward the global rate with a
    // 20-pseudo-count prior — the low-volume ranking fix.
    "q_smoothed_rates" -> ((s, d) =>
      Cohorts.smoothedRates(Tables.events(s, d), "user_id",
        col("event_type") === "purchase", priorWeight = 20)),

    // Consecutive-repeat collapse: drop events repeating the user's
    // immediately preceding type (bot retries / double fires) —
    // the scrub the sequence-mining ops assume.
    "q_collapse_runs" -> ((s, d) =>
      graft.ops.Sequences.collapseRuns(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id")),

    // Daily-activity streaks: gaps-and-islands over distinct active
    // days; longest consecutive run per user, latest-start tie-break
    // via struct-max (no second window).
    "q_streaks" -> ((s, d) =>
      Cohorts.activityStreaks(Tables.events(s, d), "user_id", "ts")),

    // Cohort LTV curve: cumulative purchase cents per signup-week
    // cohort by weeks since signup — retention's money twin.
    "q_ltv_curve" -> ((s, d) =>
      Cohorts.ltvCurve(Tables.events(s, d), "user_id", "ts",
        floor(col("value") * 100), col("event_type") === "purchase")),

    // Revenue concentration: spend share of users at or above the
    // 90th-percentile per-user spend (tie-inclusive exact threshold).
    "q_pareto_share" -> ((s, d) =>
      Cohorts.paretoShare(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", floor(col("value") * 100))),

    // New vs returning actives per day — the growth decomposition.
    "q_new_vs_returning" -> ((s, d) =>
      Cohorts.newVsReturning(Tables.events(s, d), "user_id", "ts")),

    // Activity gaps: per user, the idle stretches between active
    // days (the complement of q_streaks' islands) — churn-risk
    // surface, one lag window over the distinct-day frame.
    "q_activity_gaps" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("prev", lag(col("day"), 1).over(w))
        .filter(col("prev").isNotNull &&
          datediff(col("day"), col("prev")) > 1)
        .select(col("user_id"),
          date_add(col("prev"), 1).cast("string").as("gap_start"),
          date_sub(col("day"), 1).cast("string").as("gap_end"),
          (datediff(col("day"), col("prev")) - 1).cast("long")
            .as("gap_days"))
    }),

    // Peak concurrency: the sweep-line maximum of overlapping
    // [ts, ts+dur) spans per user — half-open semantics (a span's
    // end closes BEFORE an equal-time start opens, the -1-before-+1
    // sort), ties inside a step group can't change the group max.
    "q_peak_concurrency" -> ((s, d) => {
      val sec = col("ts").cast("timestamp").cast("long")
      val spans = Tables.events(s, d).select(col("user_id"),
        sec.as("st"),
        (sec + lit(60L) + floor(col("value") * 100).cast("long") % 540L)
          .as("en"))
      val pts = spans.select(col("user_id"), col("st").as("t"),
        lit(1L).as("delta"))
        .unionAll(spans.select(col("user_id"), col("en").as("t"),
          lit(-1L).as("delta")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
      pts.withColumn("depth", sum(col("delta")).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("depth")).as("peak_concurrency"))
    }),

    // SPRT sequential monitor: Wald's log-likelihood ratio of the
    // cumulative purchase rate against H0 p=.19 vs H1 p=.21 per day,
    // with the ln(19) decision boundaries — the "peek daily without
    // inflating alpha" readout. Cumulative counts ride one window
    // over the calendar-bounded daily frame.
    "q_sprt" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).cast("string").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("k"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      daily
        .withColumn("n_cum", sum(col("n")).over(w))
        .withColumn("s_cum", sum(col("k")).over(w))
        .select(col("day"), col("n_cum"), col("s_cum"),
          expr(SprtLlrExpr).as("llr"))
        .select(col("day"), col("n_cum"), col("s_cum"), col("llr"),
          expr(SprtDecisionExpr).as("decision"))
    }),

    // A/B sample-size calculator: arms needed to detect a 5% relative
    // lift of the base purchase rate at alpha=.05 / power=.80 (the
    // standard z constants as literals) — all inputs exact counts,
    // one closing expression.
    "q_sample_size" -> ((s, d) =>
      Tables.events(s, d)
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_success"))
        .select(col("n_events"), col("n_success"),
          expr(SampleSizeExprs._1).as("p_base"),
          expr(SampleSizeExprs._2).as("mde_abs"),
          expr(SampleSizeExprs._3).as("n_per_arm"))),

    // Week-over-week movers: per event type, first-half vs
    // second-half counts and the relative ppm change — the ops
    // dashboard's "what shifted" panel (one conditional-count agg).
    "q_movers" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          sum(when(to_date(col("ts")) < lit("2024-01-16").cast("date"),
            1L).otherwise(0L)).as("c1"),
          sum(when(to_date(col("ts")) >= lit("2024-01-16").cast("date"),
            1L).otherwise(0L)).as("c2"))
        .select(col("event_type"), col("c1"), col("c2"),
          expr("""CASE WHEN c1 = 0 THEN NULL
              ELSE CAST((c2 - c1)*1000000 AS DOUBLE)/CAST(c1 AS DOUBLE)
              END""").as("ppm_change"))),

    // Supervised feature frame: per (user, day) activity with lag-1 /
    // lag-7 features, trailing-7-day sums, and the NEXT-day label —
    // the training-table builder (all exact integers; one window
    // partitioning serves every feature and the lead label).
    "q_lag_features" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val w7 = w.rowsBetween(-6, 0)
      daily
        .withColumn("lag1", lag(col("y"), 1).over(w))
        .withColumn("lag7", lag(col("y"), 7).over(w))
        .withColumn("sum7", sum(col("y")).over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("label_next", lead(col("y"), 1).over(w))
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("y"), col("lag1"), col("lag7"), col("sum7"), col("n7"),
          col("label_next"))
    }),

    // Daily quantile fan: exact p10/p50/p90 of event cents per day
    // (one cumDist pass partitioned by day — the ops-dashboard band
    // chart, parallelism = days × buckets).
    "q_daily_quantiles" -> ((s, d) => {
      val cents = floor(col("value") * 100).cast("long")
      graft.ops.Quantiles.cumDist(
        Tables.events(s, d).select(
          to_date(col("ts")).cast("string").as("day"), cents.as("v")),
        col("day"), col("v"))
        .groupBy(col("g").as("day"))
        .agg(
          min(when(col("cum") * 10 >= col("n"), col("v"))).as("p10"),
          min(when(col("cum") * 2 >= col("n"), col("v"))).as("p50"),
          min(when(col("cum") * 10 >= col("n") * 9, col("v"))).as("p90"))
    }),

    // Pairwise Welch contrasts across event types — which groups the
    // significant ANOVA actually separates.
    "q_pairwise_contrasts" -> ((s, d) =>
      StatTests.pairwiseWelch(Tables.events(s, d), "event_type",
        floor(col("value") * 100).cast("long"))),

    // Hodges-Lehmann robust location of quantity per return flag:
    // weighted median of pairwise Walsh averages over the 50-value
    // cell frame — exact doubled-sum rank read.
    "q_hodges_lehmann" -> ((s, d) =>
      StatTests.hodgesLehmann(Tables.lineitem(s, d), "l_returnflag",
        floor(col("l_quantity")).cast("long"))
        .withColumnRenamed("g", "l_returnflag")),

    // Changepoint LOCATOR: binary segmentation over daily volume —
    // where the level shifted, the level each side, and the SSE the
    // split explains (CUSUM detects; this fits).
    "q_changepoint" -> ((s, d) =>
      graft.ops.Anomaly.changepointBinary(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // Mann-Kendall trend test on the same daily series — certifies
    // what the Theil-Sen slope sizes, tie-corrected variance.
    "q_mann_kendall" -> ((s, d) =>
      StatTests.mannKendall(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // Runs test on daily volume per event type: too few sign runs =
    // trend, too many = oscillation — the randomness certificate
    // next to the Theil-Sen slope.
    "q_runs_test" -> ((s, d) =>
      StatTests.runsTest(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // NEAREST as-of join: each event picks the temporally closest
    // order either direction (ties backward) — one exchange, both
    // direction carries in one window sort.
    "q_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"))
      graft.ops.AsOf.joinNearest(ev, "user_id", "ts",
        ord, "o_custkey", "o_orderdate", payload = Seq("o_orderdate"))
        .select(col("event_id"), col("user_id"),
          date_format(col("o_orderdate_near"), "yyyy-MM-dd")
            .as("near_order_date"),
          col("near_dist_s"))
    }),

    // Quoted-phrase search via positional posting joins — the
    // inverted-index probe, never a contains() scan.
    "q_phrase_search" -> ((s, d) =>
      graft.ops.Relevance.phraseMatch(Tables.documents(s, d),
        "doc_id", "text", Seq("table", "table"))),

    // Embedding-distribution drift: cosine/L2 between the even- and
    // odd-id cohorts' mean vectors on the exact fixed-point grid.
    "q_embed_drift" -> ((s, d) =>
      graft.ops.Embeddings.centroidDrift(Tables.embeddings(s, d),
        "embedding", col("vec_id") % 2 === 0)),

    // Quality-prune pricing sweep: for stopword-mass thresholds
    // t/10 (t = 1..5), the docs and token mass a cut at t would keep
    // — the q_ann_recall pricing discipline applied to the filter
    // decision, ONE aggregation for all five operating points (each
    // keep test is the exact integer comparison 10·stops >= t·words).
    "q_quality_sweep" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(TextOps.words(col("text")).as("ws"))
        .select(size(col("ws")).cast("long").as("nw"),
          TextOps.stopwordHits(col("ws"),
            TextOps.StopwordProfiles.head._2).as("st"))
      val aggs = Seq(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_tokens")) ++ (1 to 5).flatMap(t => Seq(
        sum(when(col("st") * 10 >= col("nw") * t, 1L).otherwise(0L))
          .as(s"kd_$t"),
        sum(when(col("st") * 10 >= col("nw") * t, col("nw"))
          .otherwise(0L)).as(s"kt_$t")))
      val stacked = (1 to 5)
        .map(t => s"$t, kd_$t, kt_$t").mkString(", ")
      base.agg(aggs.head, aggs.tail: _*)
        .selectExpr("n_docs", "n_tokens",
          s"stack(5, $stacked) AS (threshold, kept_docs, kept_tokens)")
        .select(col("threshold").cast("long").as("threshold"),
          col("kept_docs"), col("kept_tokens"),
          expr("kept_docs * 1000000 div n_docs").as("docs_ppm"),
          expr("kept_tokens * 1000000 div n_tokens").as("tokens_ppm"))
    }),

    // Forecast backtest: naive vs seasonal-naive sMAPE per event
    // type on the held-out last week — the honesty gate in front of
    // the Holt/Holt-Winters forecasters.
    "q_forecast_backtest" -> ((s, d) =>
      Timeseries.forecastBacktest(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"),
        splitDay = "2024-01-25", season = 7)
        .withColumnRenamed("g", "event_type")))

  val oracleSql: Map[String, String] = Map(

    "q_anova_f" -> {
      val numT = StatTests.BfNumTerm.replace("x.", "")
      val denT = StatTests.BfDenTerm.replace("x.", "")
      s"""WITH base AS (SELECT event_type AS g,
              CAST(floor(value*100) AS BIGINT) AS z FROM events),
          gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
              sum(z) AS s, sum(z*z) AS q FROM base GROUP BY 1),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(n_g) AS BIGINT) AS n, sum(s) AS sz FROM gs),
          terms AS (SELECT k, n,
              list($numT ORDER BY g) AS nts,
              list($denT ORDER BY g) AS dts
            FROM gs CROSS JOIN tot GROUP BY 1, 2),
          f0 AS (SELECT k, n,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), nts),
                (a, x) -> a + x) AS num,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), dts),
                (a, x) -> a + x) AS den
            FROM terms)
          SELECT k, n, num, den, ${StatTests.BfFExpr} AS f_stat FROM f0"""
    },

    "q_kruskal" -> {
      val term = StatTests.KwTerm.replace("x.", "")
      s"""WITH base AS (SELECT l_returnflag AS g,
              CAST(floor(l_quantity) AS BIGINT) AS v FROM lineitem),
          cd AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
                 FROM base GROUP BY 1, 2),
          pool AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt
                   FROM cd GROUP BY 1),
          rk AS (SELECT v, cnt,
              CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT)*2 - cnt + 1 AS dr
            FROM pool),
          g1 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
              sum(CAST(c AS DECIMAL(12,0))*CAST(dr AS DECIMAL(14,0)))
                AS r2,
              sum(CAST(c AS DECIMAL(12,0))
                  *(CAST(cnt AS DECIMAL(12,0))*CAST(cnt AS DECIMAL(12,0))
                    - 1)) AS tt
            FROM cd JOIN rk USING (v) GROUP BY 1),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(n_g) AS BIGINT) AS n,
              CAST(sum(tt) AS DOUBLE) AS tie_t FROM g1),
          terms AS (SELECT k, n, tie_t,
              list($term ORDER BY g) AS ts
            FROM g1 CROSS JOIN tot GROUP BY 1, 2, 3),
          f0 AS (SELECT k, n, tie_t,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), ts),
                (a, x) -> a + x) AS q4
            FROM terms)
          SELECT k, n, tie_t, q4, ${StatTests.KwHExpr} AS h_stat FROM f0"""
    },

    "q_jarque_bera" ->
      s"""WITH t AS (SELECT l_returnflag AS g,
              CAST(floor(l_quantity) AS BIGINT) AS x FROM lineitem),
          s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS DOUBLE) AS s1,
              CAST(sum(x*x) AS DOUBLE) AS s2,
              CAST(sum(x*x*x) AS DOUBLE) AS s3,
              CAST(sum(x*x*x*x) AS DOUBLE) AS s4
            FROM t GROUP BY g),
          m AS (SELECT g, n,
            CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
            ELSE (s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n)) /
                 ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n)))
            END AS skew,
            CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
            ELSE (s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                    - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
                 ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0
            END AS kurt_excess
          FROM s)
          SELECT g, n, skew, kurt_excess, ${Moments.JbExpr} AS jb_stat
          FROM m""",

    "q_cramers_v" ->
      s"""WITH s AS (SELECT event_type AS a, hour(ts) // 6 AS b
            FROM events),
          cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS obs
                    FROM s GROUP BY 1, 2),
          r AS (SELECT a, CAST(sum(obs) AS BIGINT) AS row_total
                FROM cells GROUP BY 1),
          c AS (SELECT b, CAST(sum(obs) AS BIGINT) AS col_total
                FROM cells GROUP BY 1),
          t AS (SELECT CAST(sum(obs) AS BIGINT) AS n_total FROM cells),
          grid AS (SELECT r.a AS a, c.b AS b,
              row_total, col_total, n_total,
              CAST(CAST(n_total*COALESCE(obs, 0) - row_total*col_total
                     AS HUGEINT)
                   * (n_total*COALESCE(obs, 0) - row_total*col_total)
                   AS DOUBLE)
                / CAST(n_total*row_total*col_total AS DOUBLE) AS chi_term
            FROM r CROSS JOIN c CROSS JOIN t
            LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b),
          agg AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
              CAST(count(DISTINCT b) AS BIGINT) AS c,
              max(n_total) AS n,
              list(chi_term ORDER BY a, b) AS cs
            FROM grid),
          f0 AS (SELECT r, c, n,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), cs),
                (acc, x) -> acc + x) AS chi2
            FROM agg)
          SELECT r, c, n, chi2, ${Profile.CvExpr} AS cramers_v FROM f0""",

    "q_merge_intervals" ->
      """WITH base AS (SELECT user_id AS k,
              CAST(floor(epoch(ts)) AS BIGINT) AS s,
              CAST(floor(epoch(ts)) AS BIGINT)
                + 60 + CAST(floor(value*100) AS BIGINT) % 540 AS e,
              event_id AS rid
            FROM events),
          w1 AS (SELECT k, s, e, rid,
              max(e) OVER (PARTITION BY k ORDER BY s, rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM base),
          w2 AS (SELECT k, s, e, rid,
              CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
                AS opens
            FROM w1),
          w3 AS (SELECT k, s, e,
              CAST(sum(opens) OVER (PARTITION BY k ORDER BY s, rid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS island
            FROM w2)
          SELECT k AS user_id, island,
            CAST(min(s) AS BIGINT) AS start_s,
            CAST(max(e) AS BIGINT) AS end_s,
            CAST(count(*) AS BIGINT) AS n_merged
          FROM w3 GROUP BY 1, 2""",

    "q_mode" ->
      """WITH cn AS (SELECT l_returnflag,
              CAST(floor(l_quantity) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1, 2)
          SELECT l_returnflag,
            (max({'c': c, 'v': v})).v AS mode_qty,
            (max({'c': c, 'v': v})).c AS n_mode
          FROM cn GROUP BY 1""",

    "q_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, $ws AS ws FROM documents),
          lined AS (SELECT doc_id, source,
              CASE WHEN len(ws) = 0 THEN ''
              ELSE array_to_string(list_transform(
                     range(0, CAST(ceil(len(ws) / 4.0) AS BIGINT)),
                     i -> array_to_string(ws[i*4+1 : i*4+4], ' ')),
                   chr(10))
              END AS text FROM toks),
          l AS (SELECT doc_id, source, u.pos AS pos, u.line AS line
                FROM (
              SELECT doc_id, source,
                unnest(list_transform(range(1, len(ln)+1),
                  i -> {'pos': i, 'line': ln[i]})) AS u
              FROM (SELECT doc_id, source,
                      string_split(text, chr(10)) AS ln FROM lined))),
          dfreq AS (SELECT source, line,
              count(DISTINCT doc_id) AS ndocs
            FROM l GROUP BY 1, 2)
          SELECT doc_id, source,
            CAST(count(*) FILTER (WHERE ndocs <= 1) AS BIGINT) AS n_kept,
            CAST(count(*) FILTER (WHERE ndocs > 1) AS BIGINT)
              AS n_dropped,
            COALESCE(string_agg(CASE WHEN ndocs <= 1 THEN line END,
                chr(10) ORDER BY pos), '') AS clean_text
          FROM l JOIN dfreq USING (source, line)
          GROUP BY 1, 2""",

    "q_winnowing" ->
      s"""WITH $winnowCtes
          SELECT DISTINCT doc_id,
            1048575 - (mk % 1048576) AS fp_pos,
            mk // 1048576 AS fp_hash
          FROM m WHERE pos >= 3""",

    "q_winnow_pairs" ->
      s"""WITH $winnowCtes,
          fp AS MATERIALIZED (SELECT DISTINCT doc_id,
              mk // 1048576 AS h FROM m WHERE pos >= 3),
          hc AS (SELECT h FROM fp GROUP BY 1
                 HAVING count(*) >= 2 AND count(*) <= 256)
          SELECT f1.doc_id AS doc_id_a, f2.doc_id AS doc_id_b,
            CAST(count(*) AS BIGINT) AS shared
          FROM fp f1 JOIN fp f2 USING (h) JOIN hc USING (h)
          WHERE f1.doc_id < f2.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 2""",

    "q_rolling_median" ->
      """WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS t,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          b AS (SELECT g, t, y,
              list_sort(list(y) OVER (PARTITION BY g ORDER BY t
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS buf
            FROM d)
          SELECT g AS event_type, t AS day, y,
            buf[(len(buf)+1)//2] AS roll_med
          FROM b""",

    "q_rfm" ->
      """WITH per AS MATERIALIZED (SELECT user_id,
              CAST(date_diff('day', max(CAST(ts AS DATE)),
                DATE '2024-02-01') AS BIGINT) AS rec_days,
              CAST(count(*) AS BIGINT) AS freq,
              CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT)
                AS mon_cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          qr AS (SELECT v AS rec_days, (5*cum + n - 1) // n AS q_r
            FROM (SELECT v,
                CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
                CAST(sum(c) OVER () AS BIGINT) AS n
              FROM (SELECT rec_days AS v, count(*) AS c
                    FROM per GROUP BY 1))),
          qf AS (SELECT v AS freq, (5*cum + n - 1) // n AS q_f
            FROM (SELECT v,
                CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
                CAST(sum(c) OVER () AS BIGINT) AS n
              FROM (SELECT freq AS v, count(*) AS c
                    FROM per GROUP BY 1))),
          qm AS (SELECT v AS mon_cents, (5*cum + n - 1) // n AS q_m
            FROM (SELECT v,
                CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
                CAST(sum(c) OVER () AS BIGINT) AS n
              FROM (SELECT mon_cents AS v, count(*) AS c
                    FROM per GROUP BY 1)))
          SELECT p.user_id, p.rec_days, p.freq, p.mon_cents,
            6 - q_r AS r_score, q_f AS f_score, q_m AS m_score,
            CAST(6 - q_r AS VARCHAR) || CAST(q_f AS VARCHAR)
              || CAST(q_m AS VARCHAR) AS segment
          FROM per p JOIN qr USING (rec_days) JOIN qf USING (freq)
          JOIN qm USING (mon_cents)""",

    "q_smoothed_rates" ->
      s"""WITH per AS MATERIALIZED (SELECT user_id,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS s
            FROM events GROUP BY 1),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS ng,
              CAST(sum(s) AS BIGINT) AS sg FROM per)
          SELECT user_id, n, s, ${Cohorts.SmoothExpr(20)}
            AS smoothed_rate
          FROM per CROSS JOIN tot""",

    "q_collapse_runs" ->
      """WITH l AS (SELECT user_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type,
              lag(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
            FROM events)
          SELECT user_id, ts_s, event_type FROM l
          WHERE prev IS NULL OR prev <> event_type""",

    "q_ltv_curve" ->
      """WITH e AS (SELECT user_id,
              CAST(date_trunc('week', ts) AS DATE) AS event_week,
              CASE WHEN event_type = 'purchase'
                   THEN CAST(floor(value*100) AS BIGINT)
                   ELSE 0 END AS cents
            FROM events),
          c AS MATERIALIZED (SELECT user_id, event_week, cents,
              min(event_week) OVER (PARTITION BY user_id) AS cohort_week
            FROM e),
          weekly AS (SELECT cohort_week,
              CAST((event_week - cohort_week) // 7 AS BIGINT)
                AS week_offset,
              CAST(sum(cents) AS BIGINT) AS wk_cents
            FROM c GROUP BY 1, 2),
          sizes AS (SELECT cohort_week,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM c GROUP BY 1)
          SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
            week_offset, n_users, wk_cents,
            CAST(sum(wk_cents) OVER (PARTITION BY cohort_week
              ORDER BY week_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents
          FROM weekly JOIN sizes USING (cohort_week)""",

    "q_pareto_share" ->
      s"""WITH per AS MATERIALIZED (SELECT user_id,
              CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT)
                AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          cdf AS (SELECT v,
              CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
              CAST(sum(c) OVER () AS BIGINT) AS n
            FROM (SELECT cents AS v, count(*) AS c FROM per GROUP BY 1)),
          thr AS (SELECT min(CASE WHEN cum*10 >= n*9 THEN v END)
                AS p90_cents FROM cdf),
          agg AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
              max(p90_cents) AS p90_cents,
              CAST(sum(CASE WHEN cents >= p90_cents THEN cents
                       ELSE 0 END) AS BIGINT) AS top_cents,
              CAST(sum(cents) AS BIGINT) AS total_cents
            FROM per CROSS JOIN thr)
          SELECT n_users, p90_cents, top_cents, total_cents,
            ${Cohorts.ParetoExpr} AS top_share
          FROM agg""",

    "q_quality_sweep" -> {
      val stopEn = TextOps.StopwordProfiles.head._2
        .map(s => s"'$s'").mkString(", ")
      val kds = (1 to 5).map(t =>
        s"""CAST(sum(CASE WHEN st*10 >= nw*$t THEN 1 ELSE 0 END)
            AS BIGINT) AS kd_$t,
            CAST(sum(CASE WHEN st*10 >= nw*$t THEN nw ELSE 0 END)
            AS BIGINT) AS kt_$t""").mkString(",\n            ")
      val unions = (1 to 5).map(t =>
        s"""SELECT $t AS threshold, kd_$t AS kept_docs,
            kt_$t AS kept_tokens, n_docs, n_tokens FROM a""")
        .mkString("\n            UNION ALL ")
      s"""WITH toks AS (SELECT $ws AS ws FROM documents),
          sig AS (SELECT CAST(len(ws) AS BIGINT) AS nw,
              CAST(len(list_filter(ws, w -> w IN ($stopEn)))
                AS BIGINT) AS st
            FROM toks),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(nw) AS BIGINT) AS n_tokens,
            $kds
            FROM sig),
          u AS ($unions)
          SELECT CAST(threshold AS BIGINT) AS threshold, kept_docs,
            kept_tokens,
            kept_docs*1000000 // n_docs AS docs_ppm,
            kept_tokens*1000000 // n_tokens AS tokens_ppm
          FROM u"""
    },

    "q_embed_drift" -> {
      import graft.ops.Embeddings.{DriftAa, DriftBb, DriftDot}
      def t(s: String) = s.replace("x.", "")
      s"""WITH comp AS (
            SELECT (vec_id % 2 = 0) AS a, i AS pos,
              CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1024)
                AS BIGINT) AS q
            FROM embeddings CROSS JOIN range(0, 64) t(i)),
          dims AS (SELECT pos,
              CAST(sum(CASE WHEN a THEN q ELSE 0 END) AS BIGINT) AS qa,
              CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
              CAST(sum(CASE WHEN NOT a THEN q ELSE 0 END) AS BIGINT)
                AS qb,
              CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
                AS nb
            FROM comp GROUP BY 1),
          agg AS (SELECT max(na) AS n_a, max(nb) AS n_b,
              list(${t(DriftDot)} ORDER BY pos) AS dts,
              list(${t(DriftAa)} ORDER BY pos) AS ats,
              list(${t(DriftBb)} ORDER BY pos) AS bts
            FROM dims),
          f0 AS (SELECT n_a, n_b,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), dts),
                (acc, x) -> acc + x) AS dot,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), ats),
                (acc, x) -> acc + x) AS aa,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), bts),
                (acc, x) -> acc + x) AS bb
            FROM agg)
          SELECT n_a, n_b,
            CASE WHEN aa = 0.0 OR bb = 0.0 THEN NULL
            ELSE dot/(sqrt(aa)*sqrt(bb)) END AS cos_sim,
            sqrt(greatest(aa - 2*dot + bb, CAST(0 AS DOUBLE)))
              AS l2_dist
          FROM f0"""
    },

    "q_activity_gaps" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          l AS (SELECT user_id, day,
              lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
            FROM days)
          SELECT user_id,
            CAST(prev + 1 AS VARCHAR) AS gap_start,
            CAST(day - 1 AS VARCHAR) AS gap_end,
            CAST(date_diff('day', prev, day) - 1 AS BIGINT) AS gap_days
          FROM l
          WHERE prev IS NOT NULL AND date_diff('day', prev, day) > 1""",

    "q_peak_concurrency" ->
      """WITH spans AS (SELECT user_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS st,
              CAST(floor(epoch(ts)) AS BIGINT)
                + 60 + CAST(floor(value*100) AS BIGINT) % 540 AS en
            FROM events),
          pts AS (SELECT user_id, st AS t, CAST(1 AS BIGINT) AS delta
            FROM spans
            UNION ALL
            SELECT user_id, en AS t, CAST(-1 AS BIGINT) AS delta
            FROM spans),
          dep AS (SELECT user_id,
              CAST(sum(delta) OVER (PARTITION BY user_id
                ORDER BY t, delta
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS depth
            FROM pts)
          SELECT user_id, CAST(max(depth) AS BIGINT)
            AS peak_concurrency
          FROM dep GROUP BY 1""",

    "q_sprt" ->
      s"""WITH d AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM events GROUP BY 1),
          c AS (SELECT day,
              CAST(sum(n) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_cum,
              CAST(sum(k) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS s_cum
            FROM d),
          l AS (SELECT day, n_cum, s_cum, $SprtLlrExpr AS llr FROM c)
          SELECT day, n_cum, s_cum, llr, $SprtDecisionExpr AS decision
          FROM l""",

    "q_sample_size" ->
      s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_success
            FROM events)
          SELECT n_events, n_success,
            ${SampleSizeExprs._1} AS p_base,
            ${SampleSizeExprs._2} AS mde_abs,
            CAST((${SampleSizeExprs._3}) AS BIGINT) AS n_per_arm
          FROM a""",

    "q_movers" ->
      """SELECT event_type,
          CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                   THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                   THEN 1 ELSE 0 END) AS BIGINT) AS c2,
          CASE WHEN sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                        THEN 1 ELSE 0 END) = 0 THEN NULL
          ELSE CAST((sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                         THEN 1 ELSE 0 END)
                     - sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN 1 ELSE 0 END))*1000000 AS DOUBLE)
               /CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                         THEN 1 ELSE 0 END) AS DOUBLE)
          END AS ppm_change
          FROM events GROUP BY 1""",

    "q_lag_features" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2)
          SELECT user_id, CAST(day AS VARCHAR) AS day, y,
            lag(y, 1) OVER w AS lag1,
            lag(y, 7) OVER w AS lag7,
            CAST(sum(y) OVER (PARTITION BY user_id ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
              AS sum7,
            CAST(count(*) OVER (PARTITION BY user_id ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
              AS n7,
            lead(y, 1) OVER w AS label_next
          FROM d
          WINDOW w AS (PARTITION BY user_id ORDER BY day)""",

    "q_daily_quantiles" ->
      """WITH base AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
              CAST(floor(value*100) AS BIGINT) AS v FROM events),
          cd AS (SELECT day, v, CAST(count(*) AS BIGINT) AS c
                 FROM base GROUP BY 1, 2),
          cc AS (SELECT day, v,
              CAST(sum(c) OVER (PARTITION BY day ORDER BY v)
                AS BIGINT) AS cum,
              CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS n
            FROM cd)
          SELECT day,
            min(CASE WHEN cum*10 >= n THEN v END) AS p10,
            min(CASE WHEN cum*2 >= n THEN v END) AS p50,
            min(CASE WHEN cum*10 >= n*9 THEN v END) AS p90
          FROM cc GROUP BY 1""",

    "q_pairwise_contrasts" ->
      s"""WITH base AS (SELECT event_type AS g,
              CAST(floor(value*100) AS BIGINT) AS z FROM events),
          g1 AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(z) AS DOUBLE) AS s,
              CAST(sum(z*z) AS DOUBLE) AS q
            FROM base GROUP BY 1),
          p AS (SELECT a.g AS g_a, b.g AS g_b,
              a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
              a.q AS qa, b.q AS qb
            FROM g1 a JOIN g1 b ON a.g < b.g)
          SELECT g_a, g_b, na AS n_a, nb AS n_b,
            sa/na AS mean_a, sb/nb AS mean_b,
            ${StatTests.PwTExpr} AS t_stat
          FROM p""",

    "q_hodges_lehmann" ->
      """WITH cells AS MATERIALIZED (SELECT l_returnflag AS g,
              CAST(floor(l_quantity) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1, 2),
          pairs AS (SELECT a.g, a.v + b.v AS w2,
              CASE WHEN a.v = b.v THEN a.c*(a.c + 1)//2
                   ELSE a.c*b.c END AS wt
            FROM cells a JOIN cells b
              ON a.g = b.g AND a.v <= b.v),
          pw AS (SELECT g, w2, CAST(sum(wt) AS BIGINT) AS wt
            FROM pairs GROUP BY 1, 2),
          cum AS (SELECT g, w2, wt,
              CAST(sum(wt) OVER (PARTITION BY g ORDER BY w2)
                AS BIGINT) AS cum,
              CAST(sum(wt) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM pw)
          SELECT g AS l_returnflag, n AS n_pairs,
            CAST(min(CASE WHEN cum*2 >= n THEN w2 END) AS DOUBLE)/2.0
              AS hl_estimate
          FROM cum GROUP BY 1, 2""",

    "q_changepoint" -> {
      def sl(k: String) =
        s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ys[1:$k]),
            (a, v) -> a + v) AS DOUBLE)"""
      def ql(k: String) =
        s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ys[1:$k]),
            (a, v) -> a + v*v) AS DOUBLE)"""
      val cost =
        s"""(${ql("k")} - ${sl("k")}*${sl("k")}/CAST(k AS DOUBLE))
            + ((q_tot - ${ql("k")})
               - (s_tot - ${sl("k")})*(s_tot - ${sl("k")})
                 /(CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))"""
      s"""WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS t,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          arr AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              list(t ORDER BY t) AS ts, list(y ORDER BY t) AS ys
            FROM d GROUP BY 1 HAVING count(*) >= 2),
          t1 AS (SELECT g, n, ts, ys,
              ${sl("CAST(n AS BIGINT)")} AS s_tot,
              ${ql("CAST(n AS BIGINT)")} AS q_tot
            FROM arr),
          t2 AS (SELECT g, n, ts, ys, s_tot, q_tot,
              list_transform(range(1, CAST(n AS BIGINT)),
                k -> $cost) AS costs
            FROM t1),
          t3 AS (SELECT g, n, ts, ys, s_tot, q_tot, costs,
              list_aggregate(costs, 'min') AS mincost
            FROM t2),
          t4 AS (SELECT g, n, ts, ys, s_tot, q_tot, mincost,
              CAST(list_position(costs, mincost) AS BIGINT) AS k
            FROM t3)
          SELECT g AS event_type, n,
            CAST(ts[CAST(k AS BIGINT)] AS VARCHAR) AS split_t,
            ${sl("k")}/CAST(k AS DOUBLE) AS mean_left,
            (s_tot - ${sl("k")})
              /(CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS mean_right,
            (q_tot - s_tot*s_tot/CAST(n AS DOUBLE)) - mincost
              AS sse_drop
          FROM t4"""
    },

    "q_mann_kendall" ->
      s"""WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS t,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          arr AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              list(y ORDER BY t) AS ys
            FROM d GROUP BY 1),
          sv AS (SELECT g, n,
              CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
              ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(2, CAST(n + 1 AS BIGINT)), j ->
                    CAST(len(list_filter(ys[1:CAST(j - 1 AS BIGINT)],
                      v -> v < ys[j])) AS BIGINT)
                    - CAST(len(list_filter(ys[1:CAST(j - 1 AS BIGINT)],
                      v -> v > ys[j])) AS BIGINT))),
                (a, x) -> a + x)
              END AS s_stat
            FROM arr),
          tt AS (SELECT g,
              CAST(sum(c*(c - 1)*(c*2 + 5)) AS BIGINT) AS tie_t
            FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS c
                  FROM d GROUP BY 1, 2) GROUP BY 1),
          f0 AS (SELECT g, n, s_stat, ${StatTests.MkVarExpr} AS var_s
            FROM sv JOIN tt USING (g))
          SELECT g AS event_type, n, s_stat, var_s,
            ${StatTests.MkZExpr} AS z
          FROM f0""",

    "q_runs_test" ->
      s"""WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS t,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          l1 AS (SELECT g, t, y,
              lag(y) OVER (PARTITION BY g ORDER BY t) AS prev
            FROM d),
          sg AS (SELECT g, t,
              CASE WHEN y > prev THEN 1 ELSE -1 END AS s
            FROM l1 WHERE prev IS NOT NULL AND y <> prev),
          l2 AS (SELECT g, s,
              lag(s) OVER (PARTITION BY g ORDER BY t) AS ps
            FROM sg),
          a AS (SELECT g,
              CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_up,
              CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_down,
              CAST(sum(CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs
            FROM l2 GROUP BY 1)
          SELECT g AS event_type, n_up, n_down, n_runs,
            ${StatTests.RunsZExpr} AS z
          FROM a""",

    "q_asof_nearest" ->
      """WITH b AS (SELECT event_id, user_id, ts, o_orderdate AS bd
            FROM events ASOF LEFT JOIN orders
            ON events.user_id = orders.o_custkey
              AND events.ts >= orders.o_orderdate),
          f AS (SELECT event_id, o_orderdate AS fd
            FROM events ASOF LEFT JOIN orders
            ON events.user_id = orders.o_custkey
              AND events.ts <= orders.o_orderdate),
          j AS (SELECT b.event_id, b.user_id, b.ts, b.bd, f.fd
            FROM b JOIN f USING (event_id)),
          pick AS (SELECT event_id, user_id,
              CASE WHEN bd IS NULL AND fd IS NULL THEN NULL
                   WHEN fd IS NULL THEN bd
                   WHEN bd IS NULL THEN fd
                   WHEN CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(bd)) AS BIGINT)
                        <= CAST(floor(epoch(fd)) AS BIGINT)
                          - CAST(floor(epoch(ts)) AS BIGINT)
                   THEN bd ELSE fd END AS nd,
              CAST(floor(epoch(ts)) AS BIGINT) AS tse
            FROM j)
          SELECT event_id, user_id,
            strftime(nd, '%Y-%m-%d') AS near_order_date,
            abs(CAST(floor(epoch(nd)) AS BIGINT) - tse) AS near_dist_s
          FROM pick""",

    "q_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $ws AS ws FROM documents),
          p AS (SELECT doc_id,
              CAST(len(list_filter(range(1, len(ws)),
                i -> ws[i] = 'table' AND ws[i+1] = 'table'))
                AS BIGINT) AS n_occ
            FROM t)
          SELECT doc_id, n_occ FROM p WHERE n_occ > 0""",

    "q_new_vs_returning" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          f AS (SELECT user_id, day,
              min(day) OVER (PARTITION BY user_id) AS first_day
            FROM days)
          SELECT CAST(day AS VARCHAR) AS day,
            CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new,
            CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returning
          FROM f GROUP BY 1""",

    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
          l AS (SELECT user_id, day,
              lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
            FROM days),
          b AS (SELECT user_id, day,
              CASE WHEN prev IS NULL
                     OR date_diff('day', prev, day) > 1
                   THEN 1 ELSE 0 END AS brk
            FROM l),
          i AS (SELECT user_id, day,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS isl
            FROM b),
          s AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len,
              min(day) AS d
            FROM i GROUP BY 1, 2)
          SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
            (max({'len': len, 'd': d})).len AS longest_streak,
            CAST((max({'len': len, 'd': d})).d AS VARCHAR) AS streak_start
          FROM s GROUP BY 1""",

    "q_forecast_backtest" -> {
      val term = Timeseries.SmapeTerm.replace("x.", "")
      s"""WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS t,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          lastt AS (SELECT g, (max({'t': t, 'y': y})).y AS naive_f
            FROM d WHERE t < DATE '2024-01-25' GROUP BY 1),
          sn AS (SELECT g, t + 7 AS t, y AS snaive_f FROM d),
          te AS (SELECT d.g, d.t, d.y, naive_f, snaive_f
            FROM d JOIN lastt USING (g) JOIN sn USING (g, t)
            WHERE d.t >= DATE '2024-01-25'),
          u AS (SELECT g, t, y, 'naive' AS method, naive_f AS f FROM te
            UNION ALL
            SELECT g, t, y, 'snaive' AS method, snaive_f AS f FROM te),
          a AS (SELECT g, method, CAST(count(*) AS BIGINT) AS n_days,
              list($term ORDER BY t) AS terms
            FROM u GROUP BY 1, 2),
          f0 AS (SELECT g, method, n_days,
              list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
                (a, x) -> a + x) AS ssum
            FROM a)
          SELECT g AS event_type, method, n_days,
            ${Timeseries.SmapeExpr} AS smape
          FROM f0"""
    })

  /** Shared winnowing CTE chain (k=3, w=4): ends at `m` holding
    * (doc_id, pos, mk) — the per-window tie-coded minimum keys.
    */
  private def winnowCtes: String =
    s"""toks AS (SELECT doc_id, $ws AS ws FROM documents),
          docs AS (SELECT doc_id, ws FROM toks WHERE len(ws) >= 6),
          gh AS (SELECT doc_id,
              list_transform(range(1, len(ws) - 1), i ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(ws[i : i+2],
                      w -> CAST(${wh("w")} AS BIGINT))),
                  (acc, x) -> (acc*31 + x) % 1000000007)) AS hs
            FROM docs),
          e AS (SELECT doc_id, u.pos - 1 AS pos, u.h AS h FROM (
              SELECT doc_id,
                unnest(list_transform(range(1, len(hs)+1),
                  i -> {'pos': i, 'h': hs[i]})) AS u
              FROM gh)),
          kk AS (SELECT doc_id, pos,
              h*1048576 + (1048575 - pos) AS key FROM e),
          m AS (SELECT doc_id, pos,
              min(key) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
            FROM kk)"""
}
