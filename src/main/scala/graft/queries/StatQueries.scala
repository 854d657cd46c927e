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

    // Restricted mean survival: area under that same KM step curve —
    // "average days to conversion, capped at the horizon".
    "q_rmst" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Survival.restrictedMeanSurvival(
        graft.ops.Survival.kaplanMeier(ev, col("ts"), col("user_id"),
          col("event_type") === "view", col("event_type") === "purchase"))
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

    // Split-conformal prediction interval for the price~quantity OLS
    // line: fit on fold 0, radius q_hat = the ⌈(n_cal+1)·9/10⌉-th
    // smallest |residual| (exact cents rank via the bucketed
    // cumDist) on fold 1, honest MEASURED coverage on fold 2. The
    // ≥90% guarantee is marginal over splits (an expectation), so no
    // always-true boolean is claimed — the measured number is the
    // deliverable.
    "q_conformal" -> ((s, d) =>
      graft.ops.Regression.splitConformal(Tables.lineitem(s, d),
        yCol = "l_extendedprice", xCol = "l_quantity",
        foldExpr = col("l_orderkey") * 7 + col("l_linenumber"))),

    // Zipf power-law fit of the term-frequency curve: OLS of
    // ln(count) on ln(rank), ranks from block rank-ranges (no global
    // sort — see Relevance.zipfFit). Slope ≈ −1 is healthy natural
    // text; the uniform synthetic vocabulary reads near 0 — the
    // honest number for this corpus.
    "q_zipf_fit" -> ((s, d) =>
      graft.ops.Relevance.zipfFit(Tables.documents(s, d), "text")),

    // Maximal-Marginal-Relevance re-rank (λ=1/2, k=3) of each anchor
    // query's brute-force top-10 — the diversity-aware selection
    // step between retrieval and use. Only integer ids are emitted:
    // floats drive the greedy comparisons (bit-stable cross-engine
    // via the annSql fold discipline), never the output.
    "q_mmr_rerank" -> ((s, d) => {
      import graft.ops.Similarity
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      val top = Similarity.bruteForceTopK(q, corpus, k = 10).persist()
      val cands = top.join(q, "qid").join(corpus, "nid")
        .select(col("qid"), col("nid"),
          Similarity.cosine(col("qv"), col("nv")).as("rel"))
      val pv = top.join(corpus, "nid")
        .select(col("qid"), col("nid"), col("nv"))
      val sims = pv.as("p1")
        .join(pv.as("p2"), col("p1.qid") === col("p2.qid") &&
          col("p1.nid") =!= col("p2.nid"))
        .select(col("p1.qid").as("qid"), col("p1.nid").as("a"),
          col("p2.nid").as("b"),
          Similarity.cosine(col("p1.nv"), col("p2.nv")).as("s"))
      Similarity.mmrRerank(cands, sims, k = 3)
    }),

    // Theil-Sen robust slope of daily event volume per type — the
    // outlier-immune twin of q_rolling_slope's OLS trend: median of
    // all pairwise day slopes over the calendar-bounded daily
    // rollup (T ≤ 31 ⇒ ≤ 465 pairs/group; the self-join touches
    // only the pre-aggregated frame).
    "q_theil_sen" -> ((s, d) =>
      graft.ops.Regression.theilSen(
        Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
              .as("x"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("x"), col("y"))
        .withColumnRenamed("g", "event_type")),

    // Histogram selectivity estimation priced against truth — the
    // other optimizer-statistics primitive: a 32-bucket equi-depth
    // histogram (exact rank boundaries from the bucketed cumDist)
    // answers "what fraction of rows is <= V" by linear
    // interpolation, and the exact answer (a conditional-max read
    // over the SAME cumdist frame — no second scan) prices it. The
    // estimator text is shared verbatim with the oracle.
    "q_selectivity_est" -> ((s, d) => {
      val cents = floor(col("l_extendedprice").cast("double") * 100)
        .cast("long")
      val cd = graft.ops.Quantiles.cumDist(
        Tables.lineitem(s, d).select(cents.as("vc")), lit(0), col("vc"))
      val aggs =
        (1 to SelB).map(k =>
          min(when(col("cum") * SelB >= col("n") * k, col("v")))
            .as(s"b$k")) ++
        SelPreds.zipWithIndex.map { case (p, i) =>
          coalesce(max(when(col("v") <= p, col("cum"))), lit(0L))
            .as(s"x$i") } :+
        first(col("n")).as("n")
      val bounds = cd.agg(min("v").as("b0"), aggs: _*)
      bounds
        .select(col("*"), explode(array(SelPreds.zipWithIndex.map {
          case (p, i) =>
            struct(lit(p).as("vq"), col(s"x$i").as("n_exact"))
        }: _*)).as("pr"))
        .select(col("pr.vq").as("vq"), col("pr.n_exact").as("n_exact"),
          col("n"), expr(selEstExpr).as("est"))
        .select(col("vq"), col("n"), col("n_exact"), col("est"),
          expr("""(est - CAST(n_exact AS DOUBLE))
            / CAST(n AS DOUBLE)""").as("abs_err_share"))
    }),

    // Per-day snapshot content fingerprint: order-insensitive
    // sum-mod-2^61 of 60-bit md5 row hashes — the anti-entropy check
    // that reconciles replicated/backfilled partitions without
    // moving rows, incrementally maintainable under append/delete
    // (see Checks.partitionDigest). Canonical row string uses only
    // integer/string columns (double formatting is engine-specific).
    "q_table_digest" -> ((s, d) =>
      graft.ops.Checks.partitionDigest(
        Tables.events(s, d).withColumn("day", to_date(col("ts"))),
        Seq("day"),
        concat_ws("|", col("event_id").cast("string"), col("event_type"),
          col("user_id").cast("string")))),

    // CMS join-cardinality estimate, priced against truth: the
    // optimizer-statistics primitive — |A ⋈ B on k| estimated as the
    // min-over-rows inner product of the two sides' count-min rows
    // (AMS-style), from two constant-size sketches and NO join. The
    // inner product can only overcount (hash collisions add mass),
    // so `never_under` is a certified always-true bound; the exact
    // join size (computed here only to price the estimate) and the
    // relative error are emitted alongside. Sketches ride 1-row
    // broadcasts; each side is one map-side-combining pass.
    "q_join_size_est" -> ((s, d) => {
      import graft.functions.CmsSketch
      val W = 1024
      val D = 3
      val ev = Tables.events(s, d).select(col("user_id").as("k"))
      val ord = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val skA = ev.agg(CmsSketch.cmsSketch(W, D)(col("k")).as("a"),
        count(lit(1)).as("n_a"))
      val skB = ord.agg(CmsSketch.cmsSketch(W, D)(col("k")).as("b"),
        count(lit(1)).as("n_b"))
      val exact = ev.groupBy("k").agg(count(lit(1)).as("ca"))
        .join(ord.groupBy("k").agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
          .as("exact_size"))
      skA.crossJoin(broadcast(skB)).crossJoin(broadcast(exact))
        .select(col("n_a"), col("n_b"), col("exact_size"),
          expr(s"""array_min(transform(sequence(0, ${D - 1}), d ->
            aggregate(sequence(0, ${W - 1}), CAST(0 AS BIGINT),
              (acc, w) -> acc + element_at(a, d * $W + w + 1)
                * element_at(b, d * $W + w + 1))))""").as("est_size"))
        .select(col("n_a"), col("n_b"), col("exact_size"),
          col("est_size"),
          (col("est_size") >= col("exact_size")).as("never_under"),
          expr("""(CAST(est_size AS DOUBLE) - CAST(exact_size AS DOUBLE))
            / CAST(exact_size AS DOUBLE)""").as("rel_err"))
    }),

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

  /** Bucket count for the equi-depth selectivity histogram. */
  private val SelB = 32

  /** Range-selectivity estimate from B equi-depth boundaries
    * b0..bB: full buckets below the probe contribute n/B each, the
    * straddling bucket linearly interpolates — the textbook
    * optimizer estimator. Shared TEXT between the Spark plan and the
    * DuckDB twin (identical token sequence ⇒ identical IEEE sums);
    * duplicate boundaries (heavy ties) fall into the zero branch
    * before any division, so no 0/0 path exists.
    */
  private def selEstExpr: String =
    (1 to SelB).map { k =>
      s"""CASE WHEN vq >= b$k THEN CAST(n AS DOUBLE)/$SelB
          WHEN vq < b${k - 1} THEN 0.0
          ELSE CAST(n AS DOUBLE)/$SelB
            * (CAST(vq - b${k - 1} AS DOUBLE)
               / CAST(b$k - b${k - 1} AS DOUBLE)) END"""
    }.mkString("(", " + ", ")")

  /** Probe points (cents) for `q_selectivity_est`. */
  private val SelPreds = Seq(1000000L, 2500000L, 5000000L)

  /** DuckDB tokenizer twin of `TextOps.words` (the shared contract
    * used across the query packs).
    */
  private val Ws =
    "list_filter(string_split(COALESCE(text, ''), ' '), w -> w <> '')"

  /** Element-wise double sum chain matching the custom float-dot
    * expression's strict sequential fold (the annSql discipline —
    * same helper as EvalQueries.dotSql).
    */
  private def dotSql(a: String, b: String, d: Int): String =
    (1 to d).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  val oracleSql: Map[String, String] = Map(

    "q_conformal" ->
      """WITH b AS MATERIALIZED (SELECT CAST(l_quantity AS DOUBLE) AS x,
              CAST(l_extendedprice AS DOUBLE) AS y,
              (l_orderkey * 7 + l_linenumber) % 3 AS fold FROM lineitem),
          t AS (SELECT CAST(floor(x * 100) AS BIGINT) AS xq,
              CAST(floor(y * 100) AS BIGINT) AS yq FROM b WHERE fold = 0),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) AS DOUBLE) AS nd,
              CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(yq) AS DOUBLE) AS sy,
              CAST(sum(xq*xq) AS DOUBLE) AS sxx,
              CAST(sum(xq*yq) AS DOUBLE) AS sxy
            FROM t),
          s2 AS (SELECT n, nd, sx, sy, nd*sxx - sx*sx AS varx,
              nd*sxy - sx*sy AS cov FROM s),
          fit AS (SELECT n AS n_train,
              CASE WHEN varx = 0 THEN 0.0 ELSE cov/varx END AS beta1,
              (sy - (CASE WHEN varx = 0 THEN 0.0 ELSE cov/varx END)*sx)
                /nd/100.0 AS beta0 FROM s2),
          cal AS MATERIALIZED (SELECT
              CAST(floor(abs(y - (beta0 + beta1 * x)) * 100) AS BIGINT)
                AS rq
            FROM b, fit WHERE fold = 1),
          cd AS (SELECT rq, count(*) AS cnt FROM cal GROUP BY 1),
          cc AS (SELECT rq, CAST(sum(cnt) OVER (ORDER BY rq) AS BIGINT)
                AS cum,
              (SELECT CAST(count(*) AS BIGINT) FROM cal) AS n_cal
            FROM cd),
          qh AS (SELECT min(n_cal) AS n_cal,
              min(CASE WHEN cum * 10 >= (n_cal + 1) * 9 THEN rq END)
                AS q_hat FROM cc),
          tst AS (SELECT f.n_train, q.n_cal, q.q_hat,
              CASE WHEN CAST(floor(abs(y - (beta0 + beta1 * x)) * 100)
                AS BIGINT) <= q.q_hat THEN 1 ELSE 0 END AS cov
            FROM b, fit f, qh q WHERE fold = 2)
          SELECT n_train, n_cal, CAST(count(*) AS BIGINT) AS n_test,
            q_hat, CAST(sum(cov) AS BIGINT) AS n_covered,
            CAST(sum(cov) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              AS coverage
          FROM tst GROUP BY n_train, n_cal, q_hat""",

    "q_zipf_fit" ->
      s"""WITH toks AS (SELECT unnest($Ws) AS term FROM documents),
          tc AS MATERIALIZED (SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1),
          pts AS (SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC)
                AS DOUBLE)) AS x,
              ln(CAST(c AS DOUBLE)) AS y FROM tc),
          t AS (SELECT CAST(floor(x * 100) AS BIGINT) AS xq,
              CAST(floor(y * 100) AS BIGINT) AS yq FROM pts),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(*) AS DOUBLE) AS nd,
              CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(yq) AS DOUBLE) AS sy,
              CAST(sum(xq*xq) AS DOUBLE) AS sxx,
              CAST(sum(xq*yq) AS DOUBLE) AS sxy,
              CAST(sum(yq*yq) AS DOUBLE) AS syy
            FROM t),
          s2 AS (SELECT n, nd, sx, sy,
              nd*sxx - sx*sx AS varx, nd*syy - sy*sy AS vary,
              nd*sxy - sx*sy AS cov FROM s),
          s3 AS (SELECT *, CASE WHEN varx = 0 THEN 0.0 ELSE cov/varx END
                AS beta1 FROM s2)
          SELECT n, (sy - beta1*sx)/nd/100.0 AS beta0, beta1,
            CASE WHEN varx = 0 OR vary = 0 THEN 0.0
                 ELSE (cov*cov)/(varx*vary) END AS r2
          FROM s3""",

    "q_mmr_rerank" -> {
      val dot = dotSql("qv", "nv", 64)
      val qn = dotSql("qv", "qv", 64)
      val nn = dotSql("nv", "nv", 64)
      val dab = dotSql("av", "bv", 64)
      val na = dotSql("av", "av", 64)
      val nb = dotSql("bv", "bv", 64)
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
            FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
          sc AS MATERIALIZED (SELECT qid, nid,
              ($dot) / (sqrt($qn) * sqrt($nn)) AS rel
            FROM c, q WHERE nid <> qid),
          top AS MATERIALIZED (SELECT qid, nid, rel FROM (
              SELECT qid, nid, rel, ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY rel DESC, nid) AS rn FROM sc) WHERE rn <= 10),
          pv AS MATERIALIZED (SELECT t.qid, t.nid, e.embedding AS v
            FROM top t JOIN embeddings e ON e.vec_id = t.nid),
          sims AS MATERIALIZED (SELECT p1.qid, p1.nid AS a, p2.nid AS b,
              ($dab) / (sqrt($na) * sqrt($nb)) AS s
            FROM (SELECT qid, nid, v AS av FROM pv) p1
            JOIN (SELECT qid, nid, v AS bv FROM pv) p2
              ON p1.qid = p2.qid AND p1.nid <> p2.nid),
          r1 AS (SELECT qid, nid FROM (SELECT qid, nid,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY -(0.5*rel - 0.5*CAST(0 AS DOUBLE)), nid) AS rn
              FROM top) WHERE rn = 1),
          r2c AS (SELECT t.qid, t.nid, t.rel, s.s AS ms
            FROM top t JOIN r1 ON t.qid = r1.qid AND t.nid <> r1.nid
            JOIN sims s ON s.qid = t.qid AND s.a = t.nid AND s.b = r1.nid),
          r2 AS (SELECT qid, nid FROM (SELECT qid, nid,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY -(0.5*rel - 0.5*ms), nid) AS rn
              FROM r2c) WHERE rn = 1),
          r3c AS (SELECT t.qid, t.nid, t.rel, max(s.s) AS ms
            FROM top t JOIN r1 ON t.qid = r1.qid
            JOIN r2 ON t.qid = r2.qid
            JOIN sims s ON s.qid = t.qid AND s.a = t.nid
              AND (s.b = r1.nid OR s.b = r2.nid)
            WHERE t.nid <> r1.nid AND t.nid <> r2.nid
            GROUP BY t.qid, t.nid, t.rel),
          r3 AS (SELECT qid, nid FROM (SELECT qid, nid,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY -(0.5*rel - 0.5*ms), nid) AS rn
              FROM r3c) WHERE rn = 1)
          SELECT qid, CAST(1 AS BIGINT) AS pick_rank, nid FROM r1
          UNION ALL SELECT qid, CAST(2 AS BIGINT), nid FROM r2
          UNION ALL SELECT qid, CAST(3 AS BIGINT), nid FROM r3"""
    },

    "q_kaplan_meier" ->
      s"""WITH $KmCtes
          SELECT s.t, s.d, s.c, CAST(s.n AS BIGINT) AS n,
            list_reduce(list_prepend(CAST(1 AS DOUBLE),
              list_slice(f.l, 1, s.rn)), (a, b) -> a * b) AS surv
          FROM st s, fs f""",

    "q_rmst" ->
      s"""WITH $KmCtes,
          fin AS (SELECT s.t, CAST(s.n AS BIGINT) AS n,
              list_reduce(list_prepend(CAST(1 AS DOUBLE),
                list_slice(f.l, 1, s.rn)), (a, b) -> a * b) AS surv
            FROM st s, fs f),
          tm AS (SELECT t,
              CAST(t - COALESCE(lag(t) OVER (ORDER BY t), 0) AS DOUBLE)
              * COALESCE(lag(surv) OVER (ORDER BY t),
                  CAST(1 AS DOUBLE)) AS term
            FROM fin),
          l AS (SELECT list(term ORDER BY t) AS terms,
              (SELECT max(n) FROM fin) AS n FROM tm)
          SELECT n, list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
            (a, b) -> a + b) AS rmst_days
          FROM l""",

    // (KmCtes is defined at the bottom of this object: the shared
    // life-table chain both survival oracles build on.)

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

    "q_theil_sen" ->
      """WITH daily AS MATERIALIZED (SELECT event_type AS g,
              CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                AS BIGINT) AS x,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          p AS (SELECT l.g,
              CAST(r.y - l.y AS DOUBLE) / CAST(r.x - l.x AS DOUBLE) AS sl
            FROM daily l JOIN daily r ON l.g = r.g AND l.x < r.x),
          s AS (SELECT g, list_sort(list(sl)) AS sls,
              CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1)
          SELECT g AS event_type, n_pairs,
            CASE WHEN n_pairs % 2 = 1
            THEN sls[CAST((n_pairs + 1) // 2 AS BIGINT)]
            ELSE (sls[CAST(n_pairs // 2 AS BIGINT)]
              + sls[CAST(n_pairs // 2 + 1 AS BIGINT)]) / 2
            END AS ts_slope
          FROM s""",

    "q_selectivity_est" -> {
      val mins = (1 to SelB).map(k =>
        s"min(CASE WHEN cum * $SelB >= n * $k THEN v END) AS b$k")
        .mkString(", ")
      val exacts = SelPreds.zipWithIndex.map { case (p, i) =>
        s"COALESCE(max(CASE WHEN v <= $p THEN cum END), 0) AS x$i"
      }.mkString(", ")
      val cases = SelPreds.indices.map(i =>
        s"WHEN $i THEN b.x$i").mkString(" ")
      val values = SelPreds.zipWithIndex.map { case (p, i) =>
        s"($p, $i)" }.mkString(", ")
      s"""WITH vc AS MATERIALIZED (SELECT CAST(floor(
              CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS vc
            FROM lineitem),
          cd AS (SELECT vc AS v, count(*) AS cnt FROM vc GROUP BY 1),
          cc AS MATERIALIZED (SELECT v,
              CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
              (SELECT CAST(count(*) AS BIGINT) FROM vc) AS n FROM cd),
          bounds AS (SELECT min(v) AS b0, $mins, $exacts, min(n) AS n
            FROM cc),
          preds(vq, i) AS (VALUES $values),
          e AS (SELECT CAST(p.vq AS BIGINT) AS vq, b.n,
              CASE p.i $cases END AS n_exact,
              $selEstExpr AS est
            FROM preds p, bounds b)
          SELECT vq, n, n_exact, est,
            (est - CAST(n_exact AS DOUBLE)) / CAST(n AS DOUBLE)
              AS abs_err_share
          FROM e"""
    },

    "q_table_digest" ->
      """SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
              CAST(event_id AS VARCHAR), event_type,
              CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT))
            % 2305843009213693952 AS BIGINT) AS digest
        FROM events GROUP BY 1""",

    "q_join_size_est" -> {
      val W = 1024
      val P = graft.functions.CmsSketch.P
      def bkt(r: Int, v: String): String = {
        val (a, b) = graft.functions.CmsSketch.RowAB(r)
        s"((($a * ($v % $P) + $b) % $P) % $W)"
      }
      val rows = (0 until 3).flatMap(r => Seq(
        s"a$r AS (SELECT ${bkt(r, "k")} AS bkt, sum(c) AS s" +
          " FROM ca GROUP BY 1)",
        s"b$r AS (SELECT ${bkt(r, "k")} AS bkt, sum(c) AS s" +
          " FROM cb GROUP BY 1)",
        s"ip$r AS (SELECT COALESCE(sum(a$r.s * b$r.s), 0) AS v" +
          s" FROM a$r JOIN b$r USING (bkt))")).mkString(",\n          ")
      s"""WITH ea AS (SELECT user_id AS k FROM events),
          ob AS (SELECT o_custkey AS k FROM orders),
          ca AS MATERIALIZED (SELECT k, count(*) AS c FROM ea GROUP BY 1),
          cb AS MATERIALIZED (SELECT k, count(*) AS c FROM ob GROUP BY 1),
          exact AS (SELECT CAST(COALESCE(sum(ca.c * cb.c), 0) AS BIGINT)
              AS exact_size FROM ca JOIN cb USING (k)),
          na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ea),
          nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM ob),
          $rows,
          est AS (SELECT CAST(least(ip0.v, ip1.v, ip2.v) AS BIGINT)
              AS est_size FROM ip0, ip1, ip2)
          SELECT n_a, n_b, exact_size, est_size,
            est_size >= exact_size AS never_under,
            (CAST(est_size AS DOUBLE) - CAST(exact_size AS DOUBLE))
            / CAST(exact_size AS DOUBLE) AS rel_err
          FROM na, nb, exact, est"""
    },

    "q_heavy_hitters" ->
      """WITH k AS (SELECT concat('k', CAST(CAST(floor(100 / (1 +
              (CAST(floor(value * 100) AS BIGINT) % 100))) AS BIGINT)
              AS VARCHAR)) AS kk FROM events),
          c AS MATERIALIZED (SELECT kk, CAST(count(*) AS BIGINT) AS cnt
            FROM k GROUP BY 1),
          t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
          SELECT kk, cnt, n, TRUE AS found, TRUE AS within_bound
          FROM c, t WHERE cnt * 9 > n""")

  /** Shared Kaplan-Meier life-table CTE chain (view→purchase,
    * censored at the frame horizon) ending at `st` (t, d, c, rn, n)
    * and `fs` (the ordered survival-factor list) — the base both
    * `q_kaplan_meier` and `q_rmst` close over.
    */
  private def KmCtes: String =
    """fv AS (SELECT user_id, min(ts) AS b FROM events
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
            FROM st)"""
}
