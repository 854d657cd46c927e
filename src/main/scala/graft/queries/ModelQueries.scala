package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ops.{Classifier, Graphs, Layout, Quantiles, StatTests, Timeseries}

/** Sixth operator pack: model-quality and planning primitives —
  * partition quality for community detection (modularity), the two
  * classic learned baselines a corpus pipeline screens with (decision
  * stump, multinomial naive Bayes), seasonal forecasting
  * (Holt-Winters), and compaction planning over a file inventory.
  *
  * Oracle-parity discipline (unchanged from [[StatQueries]]): exact
  * integer counts everywhere; every closing double is either a
  * token-shared expression string (`Graphs.ModularityExpr`,
  * `Classifier.NbLpExpr`/`NbScoreExpr`) or a strictly ordered fold
  * mirrored as a recursive CTE / ordered list_reduce.
  */
object ModelQueries {

  /** Compaction target bytes for `q_compact_bins` — sized so the
    * synthetic inventory yields a handful of bins at sf0.01 and ~50
    * at sf0.1.
    */
  private val CompactTarget = 16384L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Newman modularity of the 3-round label-propagation partition
    // over the supplier↔part graph: does the detected community
    // structure beat chance? Per-community rows (e_in, d_sum, Q_c)
    // make the readout hash-checkable and point at the communities
    // carrying the structure. The undirected edge set is built ONCE
    // (persisted) and feeds both the symmetrized LP input and the
    // modularity rollup.
    "q_modularity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"),
          (col("l_partkey") * 2L).as("pn"))
      val und = li.select(
          least(col("pn"), col("sn")).as("a"),
          greatest(col("pn"), col("sn")).as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = und.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
      val labels = Graphs.labelPropagation(edges, "src", "dst", iters = 3)
      Graphs.modularity(und, "a", "b", labels)
    }),

    // Best decision stump "fulfilled iff ordered on/before day v":
    // exact misclassification argmin over every distinct order-day
    // threshold, cumulative counts on the two-phase bucketed prefix
    // (no single-task sort), ties to the smallest day.
    "q_stump" -> ((s, d) =>
      Classifier.bestStump(
        Tables.orders(s, d),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long"),
        col("o_orderstatus") === "F")),

    // Additive Holt-Winters (period 7) over daily event volume per
    // type: level + trend + weekly seasonal slots, one-step-ahead
    // forecast. The seasonal upgrade of q_holt_forecast.
    "q_holt_winters" -> ((s, d) =>
      Timeseries.holtWinters(
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y")),
        col("event_type"), col("day"), col("y"), period = 7)
        .withColumnRenamed("g", "event_type")),

    // Multinomial naive Bayes language ID: train class-conditional
    // token counts on doc_id % 5 != 0, score the held-out fifth,
    // argmax class per doc — the generative baseline alongside the
    // heuristic q_lang_id and the hashed-linear q_quality_classifier.
    "q_naive_bayes" -> ((s, d) =>
      Classifier.naiveBayes(Tables.documents(s, d), "doc_id", "text",
        "lang", col("doc_id") % 5 === 0)),

    // Compaction planning: per-(day, type) payload inventory →
    // target-sized output bins by cumulative byte offset, preserving
    // key order so outputs stay range-prunable.
    "q_compact_bins" -> ((s, d) =>
      Layout.compactionBins(
        Tables.events(s, d)
          .groupBy(concat(to_date(col("ts")).cast("string"), lit("|"),
            col("event_type")).as("k"))
          .agg(sum(length(col("props"))).cast("long").as("bytes")),
        col("k"), col("bytes"), CompactTarget)),

    // Seasonal-adjusted robust anomalies: per (type, day-of-week)
    // MEDIAN seasonal baseline, then median/MAD robust z over the
    // residuals per type — variance drift and weekday shape can't
    // mask a genuine spike (plain q_robust_z flags every Sunday on a
    // weekly-shaped series; this flags only days off their OWN
    // weekday). The ONLY data-sized stage is the events→daily
    // aggregation (persisted); every median after that is an exact
    // sorted-array read over CALENDAR-BOUNDED frames (≤ days-per-
    // weekday per seasonal cell, ≤ days per type) computed in single
    // hash aggregations — the general-purpose cumDist pipelines this
    // replaced cost 12 scheduler rounds to rank ~150 rows (6.8 s →
    // 0.70 s, 5-run isolated medians at sf0.1; identical oracle hash,
    // the element read `sorted[(n+1) div 2]` IS `min v: 2·cum(v) ≥ n`).
    "q_seasonal_outliers" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .withColumn("dow",
          pmod(datediff(col("day"), lit("1970-01-01")) + 4, lit(7))
            .cast("long"))
        .persist()
      val sea = daily.groupBy(col("event_type"), col("dow"))
        .agg(sort_array(collect_list(col("y"))).as("ys"))
        .select(col("event_type"), col("dow"),
          expr("element_at(ys, CAST((size(ys) + 1) div 2 AS INT))")
            .as("sea_med"))
      val resid = daily.join(broadcast(sea), Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("y"), col("sea_med"),
          (col("y") - col("sea_med")).as("resid"))
      val stats = resid.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("resid"))).as("rs"))
        .select(col("event_type"),
          expr("element_at(rs, CAST((size(rs) + 1) div 2 AS INT))")
            .as("med_r"),
          col("rs"))
        .select(col("event_type"), col("med_r"),
          expr("""element_at(array_sort(transform(rs,
                x -> abs(x - med_r))),
              CAST((size(rs) + 1) div 2 AS INT))""").as("mad"))
      resid.join(broadcast(stats), Seq("event_type"))
        .select(col("event_type"), col("day"), col("y"), col("sea_med"),
          col("resid"),
          expr(s"CASE WHEN mad = 0 THEN NULL ELSE $RzExpr END").as("rz"),
          expr(s"""CASE WHEN mad = 0 THEN false
              ELSE abs($RzExpr) > 3.0 END""").as("is_out"))
    }),

    // Brown-Forsythe variance-homogeneity F over price deviations
    // per return flag — the gatekeeper the test battery was missing
    // (mean-shift monitors can't see variance drift).
    "q_levene" -> ((s, d) =>
      StatTests.brownForsythe(Tables.lineitem(s, d), "l_returnflag",
        floor(col("l_extendedprice") * 100).cast("long"))),

    // Mean-average-precision trail of the wc-ranked top 20 against
    // binary relevance (the q_ndcg anchor with 0/1 labels): per rank,
    // precision@r and the running AP — the set-retrieval twin of the
    // graded-gain NDCG readout.
    "q_map_eval" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          size(graft.ops.TextOps.words(col("text"))).cast("long").as("wc"),
          expr("CASE WHEN n_chars div 150 >= 2 THEN 1 ELSE 0 END")
            .cast("long").as("rel"))
      val ws = Window.orderBy(col("wc").desc, col("doc_id"))
      val wc2 = Window.orderBy("vrank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.orderBy(col("wc").desc, col("doc_id")).limit(20)
        .withColumn("vrank", row_number().over(ws).cast("long"))
        .withColumn("cum_rel", sum("rel").over(wc2))
        .withColumn("ap_num", sum(expr(MapTermExpr)).over(wc2))
        .select(col("vrank"), col("doc_id"), col("rel"), col("cum_rel"),
          expr(PAtRExpr).as("p_at_r"),
          expr("""ap_num / CAST(CASE WHEN cum_rel = 0 THEN 1
              ELSE cum_rel END AS DOUBLE)""").as("ap_at_r"))
    }))

  /** Shared Spark↔oracle text for the seasonal-residual robust z
    * ((resid − med_r) / (MAD·1.4826)).
    */
  private val RzExpr: String =
    """(CAST(resid AS DOUBLE) - CAST(med_r AS DOUBLE))
       / (CAST(mad AS DOUBLE) * 1.4826)"""

  /** Shared precision@r and AP summand texts for `q_map_eval`. */
  private val PAtRExpr: String =
    "CAST(cum_rel AS DOUBLE) / CAST(vrank AS DOUBLE)"
  private val MapTermExpr: String =
    s"CAST(rel AS DOUBLE) * ($PAtRExpr)"

  /** Unrolled synchronous label-propagation round (the q_label_prop
    * oracle shape): packed-long argmax for mode-with-min-tie-break.
    */
  private def lpRound(t: Int, prev: String): String = {
    val Pack = 2147483648L
    s"""c$t AS MATERIALIZED (SELECT e.dst AS node, p.lbl, count(*) AS c
          FROM edges e JOIN $prev p ON e.src = p.node GROUP BY 1, 2),
        k$t AS MATERIALIZED (SELECT node,
            max(c*$Pack + (${Pack - 1L} - lbl)) AS k
          FROM c$t GROUP BY node),
        l$t AS MATERIALIZED (SELECT p.node,
            CASE WHEN k IS NULL THEN p.lbl
                 ELSE ${Pack - 1L} - (k % $Pack) END AS lbl
          FROM $prev p LEFT JOIN k$t USING (node))"""
  }

  /** Holt-Winters recursive-CTE helpers: the seasonal-slot read for
    * fold row rn+1 (slot rn % 7) and the l_t expression (repeated
    * inside b_t and the slot update, exactly as the Spark lambda
    * repeats it — no let-binding either side).
    */
  private def hwSlot(rn: String): String =
    "CASE " + (0 until 7).map(k => s"WHEN $rn % 7 = $k THEN f.s$k")
      .mkString(" ") + " END"

  private def hwLt: String =
    s"((CAST(d.y AS DOUBLE) - ${hwSlot("f.rn")}) + f.l + f.b) / 2"

  val oracleSql: Map[String, String] = Map(

    "q_modularity" -> {
      s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
          und AS MATERIALIZED (SELECT DISTINCT
              LEAST(2*l_partkey, 2*l_suppkey + 1) AS a,
              GREATEST(2*l_partkey, 2*l_suppkey + 1) AS b FROM li),
          edges AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM und
            UNION ALL SELECT b AS src, a AS dst FROM und),
          nodes AS (SELECT DISTINCT src AS node FROM edges
                    UNION SELECT DISTINCT dst FROM edges),
          l0 AS (SELECT node, node AS lbl FROM nodes),
          ${lpRound(1, "l0")},
          ${lpRound(2, "l1")},
          ${lpRound(3, "l2")},
          m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
          ein AS (SELECT la.lbl AS label, CAST(count(*) AS BIGINT) AS e_in
                  FROM und u JOIN l3 la ON u.a = la.node
                  JOIN l3 lb ON u.b = lb.node
                  WHERE la.lbl = lb.lbl GROUP BY 1),
          deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
                  (SELECT a AS node FROM und
                   UNION ALL SELECT b FROM und) GROUP BY 1),
          ds AS (SELECT l.lbl AS label, CAST(sum(deg) AS BIGINT) AS d_sum,
                   CAST(count(*) AS BIGINT) AS n_nodes
                 FROM deg dg JOIN l3 l ON dg.node = l.node GROUP BY 1),
          j AS (SELECT ds.label, ds.n_nodes,
                  CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
                  ds.d_sum, m.m
                FROM ds LEFT JOIN ein e ON ds.label = e.label
                CROSS JOIN m)
          SELECT CAST(label AS BIGINT) AS label, n_nodes, e_in, d_sum,
            ${Graphs.ModularityExpr} AS q_part
          FROM j"""
    },

    "q_stump" ->
      """WITH o AS MATERIALIZED (SELECT
              CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) AS v,
              CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS p
            FROM orders),
          d AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(p) AS BIGINT) AS pos FROM o GROUP BY 1),
          c AS (SELECT v,
              CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS nl,
              CAST(sum(pos) OVER (ORDER BY v) AS BIGINT) AS posl,
              (SELECT CAST(count(*) AS BIGINT) FROM o) AS n,
              (SELECT CAST(sum(p) AS BIGINT) FROM o) AS npos
            FROM d),
          e AS (SELECT v, n, npos,
              LEAST(posl, nl - posl)
                + LEAST(npos - posl, (n - nl) - (npos - posl)) AS err
            FROM c),
          s AS (SELECT n, npos, min({'err': err, 'v': v}) AS mb
                FROM e GROUP BY 1, 2),
          f AS (SELECT n, npos AS n_pos, mb.v AS split_x, mb.err AS err,
                  LEAST(npos, n - npos) AS base_err
                FROM s)
          SELECT n, n_pos, split_x, err, base_err,
            CAST(n - err AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
            CAST(n - base_err AS DOUBLE) / CAST(n AS DOUBLE) AS base_acc
          FROM f""",

    "q_holt_winters" -> {
      val seedS = (0 until 7).map(k => s"CAST(0 AS DOUBLE) AS s$k")
        .mkString(", ")
      val stepS = (0 until 7).map(k =>
        s"""CASE WHEN f.rn % 7 = $k
            THEN ((CAST(d.y AS DOUBLE) - $hwLt) + f.s$k) / 2
            ELSE f.s$k END""").mkString(", ")
      s"""WITH RECURSIVE daily AS MATERIALIZED (
            SELECT event_type, CAST(count(*) AS BIGINT) AS y,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY CAST(ts AS DATE)) AS rn
            FROM events GROUP BY event_type, CAST(ts AS DATE)),
          nn AS MATERIALIZED (SELECT event_type,
              CAST(max(rn) AS BIGINT) AS n_obs
            FROM daily GROUP BY 1),
          fold AS (
            SELECT event_type, rn, CAST(y AS DOUBLE) AS l,
              CAST(0 AS DOUBLE) AS b, $seedS
            FROM daily WHERE rn = 1
            UNION ALL
            SELECT d.event_type, d.rn,
              $hwLt,
              ($hwLt - f.l + f.b) / 2,
              $stepS
            FROM fold f JOIN daily d
              ON d.event_type = f.event_type AND d.rn = f.rn + 1),
          fin AS (SELECT f.event_type, n.n_obs, f.l AS level,
              f.b AS trend, ${hwSlot("n.n_obs")} AS s_next
            FROM fold f JOIN nn n
              ON f.event_type = n.event_type AND f.rn = n.n_obs)
          SELECT event_type, n_obs, level, trend, s_next,
            level + trend + s_next AS forecast
          FROM fin"""
    },

    "q_naive_bayes" -> {
      val ws = "list_filter(string_split(COALESCE(text, ''), ' '), " +
        "w -> w <> '')"
      s"""WITH base AS MATERIALIZED (SELECT doc_id, lang AS cls,
              $ws AS ws, (doc_id % 5 = 0) AS is_test FROM documents),
          tok AS MATERIALIZED (SELECT doc_id, cls, is_test,
              unnest(ws) AS w FROM base),
          cw AS MATERIALIZED (SELECT cls, w, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE NOT is_test GROUP BY 1, 2),
          vocab AS MATERIALIZED (SELECT DISTINCT w FROM cw),
          cp AS MATERIALIZED (SELECT t.cls, t.tl, p.n_c, vv.v, ntr.n_tr
            FROM (SELECT cls, CAST(sum(c) AS BIGINT) AS tl
                  FROM cw GROUP BY 1) t
            JOIN (SELECT cls, CAST(count(*) AS BIGINT) AS n_c
                  FROM base WHERE NOT is_test GROUP BY 1) p USING (cls)
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS v
                        FROM vocab) vv
            CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_tr
                        FROM base WHERE NOT is_test) ntr),
          grid AS MATERIALIZED (SELECT g.cls, g.w,
              ${Classifier.NbLpExpr} AS lp
            FROM (SELECT vo.w, cp.cls, cp.tl, cp.v
                  FROM vocab vo CROSS JOIN cp) g
            LEFT JOIN cw ON cw.cls = g.cls AND cw.w = g.w),
          dt AS MATERIALIZED (SELECT doc_id, w,
              CAST(count(*) AS BIGINT) AS tf
            FROM tok WHERE is_test GROUP BY 1, 2),
          dtot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_tot
                   FROM dt GROUP BY 1),
          mt AS MATERIALIZED (SELECT dt.doc_id, grid.cls,
              CAST(sum(tf) AS BIGINT) AS tf_in,
              list(CAST(tf AS DOUBLE) * lp ORDER BY dt.w) AS ls
            FROM dt JOIN grid ON dt.w = grid.w GROUP BY 1, 2),
          sk AS (SELECT b.doc_id, b.cls AS actual, cp.cls,
                   cp.tl, cp.v, cp.n_c, cp.n_tr
                 FROM base b CROSS JOIN cp WHERE b.is_test),
          sc AS (SELECT s.doc_id, s.actual, s.cls,
              COALESCE(m.tf_in, 0) AS tf_in,
              COALESCE(dd.tf_tot, 0) AS tf_tot,
              COALESCE(list_reduce(
                list_prepend(CAST(0 AS DOUBLE), m.ls),
                (a, x) -> a + x), CAST(0 AS DOUBLE)) AS folded,
              s.tl, s.v, s.n_c, s.n_tr
            FROM sk s
            LEFT JOIN mt m ON m.doc_id = s.doc_id AND m.cls = s.cls
            LEFT JOIN dtot dd ON dd.doc_id = s.doc_id),
          ps AS (SELECT doc_id, actual, cls,
              ${Classifier.NbScoreExpr} AS score FROM sc),
          ag AS (SELECT doc_id, actual,
              max({'score': score, 'cls': cls}) AS mb
            FROM ps GROUP BY 1, 2)
          SELECT doc_id, actual, mb.cls AS pred, mb.score AS best_score
          FROM ag"""
    },

    "q_seasonal_outliers" ->
      s"""WITH daily AS MATERIALIZED (SELECT event_type,
              CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y,
              (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4)
                % 7 AS dow
            FROM events GROUP BY 1, 2),
          s0 AS (SELECT event_type, dow, y, count(*) AS c
                 FROM daily GROUP BY 1, 2, 3),
          s1 AS (SELECT event_type, dow, y AS v,
              CAST(sum(c) OVER (PARTITION BY event_type, dow
                ORDER BY y) AS BIGINT) AS cum,
              CAST(sum(c) OVER (PARTITION BY event_type, dow)
                AS BIGINT) AS nn
            FROM s0),
          sea AS (SELECT event_type, dow,
              min(CASE WHEN cum*2 >= nn THEN v END) AS sea_med
            FROM s1 GROUP BY 1, 2),
          r AS MATERIALIZED (SELECT d.event_type, d.day, d.y, s.sea_med,
              d.y - s.sea_med AS resid
            FROM daily d JOIN sea s
              ON d.event_type = s.event_type AND d.dow = s.dow),
          m0 AS (SELECT event_type, resid, count(*) AS c
                 FROM r GROUP BY 1, 2),
          m1 AS (SELECT event_type, resid AS v,
              CAST(sum(c) OVER (PARTITION BY event_type
                ORDER BY resid) AS BIGINT) AS cum,
              CAST(sum(c) OVER (PARTITION BY event_type)
                AS BIGINT) AS nn
            FROM m0),
          medr AS (SELECT event_type,
              min(CASE WHEN cum*2 >= nn THEN v END) AS med_r
            FROM m1 GROUP BY 1),
          r2 AS MATERIALIZED (SELECT r.event_type, r.day, r.y, r.sea_med,
              r.resid, m.med_r, abs(r.resid - m.med_r) AS dev
            FROM r JOIN medr m ON r.event_type = m.event_type),
          d0 AS (SELECT event_type, dev, count(*) AS c
                 FROM r2 GROUP BY 1, 2),
          d1 AS (SELECT event_type, dev AS v,
              CAST(sum(c) OVER (PARTITION BY event_type
                ORDER BY dev) AS BIGINT) AS cum,
              CAST(sum(c) OVER (PARTITION BY event_type)
                AS BIGINT) AS nn
            FROM d0),
          madt AS (SELECT event_type,
              min(CASE WHEN cum*2 >= nn THEN v END) AS mad
            FROM d1 GROUP BY 1)
          SELECT r2.event_type, r2.day, r2.y, r2.sea_med, r2.resid,
            CASE WHEN mad = 0 THEN NULL ELSE $RzExpr END AS rz,
            CASE WHEN mad = 0 THEN false
                 ELSE abs($RzExpr) > 3.0 END AS is_out
          FROM r2 JOIN madt ON r2.event_type = madt.event_type""",

    "q_levene" -> {
      val numT = StatTests.BfNumTerm.replace("x.", "")
      val denT = StatTests.BfDenTerm.replace("x.", "")
      s"""WITH base AS MATERIALIZED (SELECT l_returnflag AS g,
              CAST(floor(l_extendedprice*100) AS BIGINT) AS v
            FROM lineitem),
          cd AS (SELECT g, v, count(*) AS c FROM base GROUP BY 1, 2),
          cc AS (SELECT g, v,
              CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
                AS cum,
              CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS nn
            FROM cd),
          med AS (SELECT g, min(CASE WHEN cum*2 >= nn THEN v END) AS med
                  FROM cc GROUP BY 1),
          z AS (SELECT b.g, abs(b.v - m.med) AS z
                FROM base b JOIN med m ON b.g = m.g),
          gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
              sum(z) AS s, sum(z*z) AS q FROM z GROUP BY 1),
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

    "q_map_eval" -> {
      val ws = "list_filter(string_split(COALESCE(text, ''), ' '), " +
        "w -> w <> '')"
      s"""WITH base AS (SELECT doc_id, CAST(len($ws) AS BIGINT) AS wc,
              CAST(CASE WHEN n_chars // 150 >= 2 THEN 1 ELSE 0 END
                AS BIGINT) AS rel
            FROM documents),
          top AS MATERIALIZED (SELECT doc_id, wc, rel,
              CAST(ROW_NUMBER() OVER (ORDER BY wc DESC, doc_id)
                AS BIGINT) AS vrank
            FROM base ORDER BY wc DESC, doc_id LIMIT 20),
          c1 AS (SELECT vrank, doc_id, rel,
              CAST(sum(rel) OVER (ORDER BY vrank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_rel
            FROM top),
          c2 AS (SELECT vrank, doc_id, rel, cum_rel,
              sum($MapTermExpr) OVER (ORDER BY vrank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS ap_num
            FROM c1)
          SELECT vrank, doc_id, rel, cum_rel,
            $PAtRExpr AS p_at_r,
            ap_num / CAST(CASE WHEN cum_rel = 0 THEN 1
              ELSE cum_rel END AS DOUBLE) AS ap_at_r
          FROM c2"""
    },

    "q_compact_bins" ->
      s"""WITH inv AS (SELECT
              CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type AS k,
              CAST(sum(length(props)) AS BIGINT) AS bytes
            FROM events GROUP BY 1),
          c AS (SELECT k, bytes, COALESCE(CAST(sum(bytes) OVER (
              ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING) AS BIGINT), 0) AS off
            FROM inv),
          b AS (SELECT k, bytes, off // $CompactTarget AS bin FROM c)
          SELECT CAST(bin AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS n_files,
            CAST(sum(bytes) AS BIGINT) AS bytes,
            min(k) AS first_key, max(k) AS last_key
          FROM b GROUP BY 1""")
}
