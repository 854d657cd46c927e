package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextOps

/** Fourth operator pack: dataset/model EVALUATION and lifecycle
  * operators — distribution-drift monitors (PSI, per-token
  * Jensen-Shannon), classifier evaluation (confusion matrix, Cohen's
  * kappa), schema-evolution union, zone-map construction for
  * data skipping, linear-interpolation gap fill, and tf-weighted
  * document cosine pairs. These are the "is my pipeline still
  * healthy" half of a training-data platform: the reference ships
  * the ETL (`/root/reference/main.py`); a 100 TB deployment of it
  * needs exactly these monitors around every snapshot load.
  *
  * Same oracle-parity discipline as [[CoreQueries]]: exact integer /
  * decimal sufficient statistics, ONE closing double expression whose
  * SQL text is shared verbatim between the Spark plan and the DuckDB
  * twin, ranked outputs ordered by integer keys only.
  *
  * Scale notes: every query is scan → map-side-combining hash
  * aggregation (+ a 1-row or tiny-frame broadcast where a global
  * total is needed — flagged in PlanSpec's BNL allowlist). Nothing
  * here shuffles document payloads or windows over a data-sized
  * frame without a partition key.
  */
object EvalQueries {

  /** Population-Stability-Index contribution of one bin, from exact
    * integer counts (a, ta = reference bin/total; b, tb = current) —
    * shared Spark↔oracle token for token. NULL marks a bin absent on
    * either side (conventionally capped/epsilon-smoothed downstream;
    * the raw NULL is the honest cross-engine value). Shared with the
    * streaming drift monitor ([[graft.streaming.EventStreams.psiDrift]]).
    */
  private[graft] val PsiPartExpr: String =
    """CASE WHEN a = 0 OR b = 0 THEN NULL
       ELSE (CAST(a AS DOUBLE)/ta - CAST(b AS DOUBLE)/tb)
         * ln((CAST(a AS DOUBLE)*tb)/(CAST(b AS DOUBLE)*ta)) END"""

  /** Per-token Jensen-Shannon divergence contribution between two
    * corpus halves: p·ln(p/m) + q·ln(q/m) over 2, with m = (p+q)/2;
    * zero-count sides contribute 0 exactly (lim x·ln x = 0).
    */
  private val JsdPartExpr: String =
    """(CASE WHEN a = 0 THEN 0.0
        ELSE (CAST(a AS DOUBLE)/ta)
          * ln((CAST(a AS DOUBLE)/ta)
              / ((CAST(a AS DOUBLE)/ta + CAST(b AS DOUBLE)/tb)/2)) END
      + CASE WHEN b = 0 THEN 0.0
        ELSE (CAST(b AS DOUBLE)/tb)
          * ln((CAST(b AS DOUBLE)/tb)
              / ((CAST(a AS DOUBLE)/ta + CAST(b AS DOUBLE)/tb)/2)) END) / 2"""

  /** Cohen's kappa from exact sufficient statistics: n rows, s_diag
    * agreeing rows, s_prod = Σ_c rowTotal_c·colTotal_c (folded in
    * DECIMAL(38) — n² leaves long range at ~3·10⁹ rows — and cast to
    * double ONCE as s_prod_d). κ = (n·s_diag − s_prod)/(n² − s_prod),
    * evaluated in doubles from the exact inputs with identical
    * operation order on both engines.
    */
  private val KappaExpr: String =
    """(CAST(n AS DOUBLE)*s_diag - s_prod_d)
       / (CAST(n AS DOUBLE)*n - s_prod_d)"""

  /** Linear interpolation between anchors (dn, v) and (nd, nv) at
    * integer position `day`: exact integer numerator, one closing
    * division. A missing right anchor (series tail) carries the last
    * value forward.
    */
  private val InterpExpr: String =
    """CASE WHEN nd IS NULL THEN CAST(v AS DOUBLE)
       ELSE CAST(v AS DOUBLE)
         + (CAST(nv - v AS DOUBLE) * (day - dn)) / (nd - dn) END"""

  /** Candidate-pruned cosine between tf vectors, from exact integer
    * dot product and squared norms.
    */
  private val CosExpr: String =
    "CAST(dot AS DOUBLE) / (sqrt(CAST(n1 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))"

  /** Reciprocal-rank-fusion score of one document from its (possibly
    * absent) ranks in two lists, k = 60 (the Cormack et al. default).
    * Only +/÷ of small integers — IEEE correctly-rounded ops, so the
    * doubles (and any ordering on them) are bit-identical
    * cross-engine, unlike ln/exp-bearing scores.
    */
  private val RrfExpr: String =
    """COALESCE(CAST(1 AS DOUBLE)/(60 + ra), CAST(0 AS DOUBLE))
       + COALESCE(CAST(1 AS DOUBLE)/(60 + rb), CAST(0 AS DOUBLE))"""

  /** Gains/lift read-outs from exact cumulative integers. */
  private val PopShareExpr: String = "CAST(cum_n AS DOUBLE)/tn"
  private val CaptureExpr: String =
    "CASE WHEN tp = 0 THEN NULL ELSE CAST(cum_pos AS DOUBLE)/tp END"
  private val LiftExpr: String =
    """CASE WHEN tp = 0 OR cum_n = 0 THEN NULL
       ELSE (CAST(cum_pos AS DOUBLE)*tn)/(CAST(cum_n AS DOUBLE)*tp) END"""

  /** Vocabulary coverage share from exact cumulative counts. */
  private val CovExpr: String = "CAST(cum_cnt AS DOUBLE)/tot"

  private val SegMeanExpr: String = graft.ops.Classifier.SegMeanExpr

  /** Leave-one-out target encoding: the bin's conversion mean with
    * the row itself held out — the standard leakage guard. Exact
    * integer numerator, one division; singleton bins yield NULL.
    */
  private val LooExpr: String =
    """CASE WHEN n_b = 1 THEN NULL
       ELSE CAST(s_b - y AS DOUBLE)/(n_b - 1) END"""

  /** OLS slope over a full trailing 7-observation window from exact
    * integer power sums (the q_ols_fit closed form on a rolling
    * frame).
    */
  private val SlopeExpr: String =
    """CASE WHEN cw < 7 OR (7*sxx - sx*sx) = 0 THEN NULL
       ELSE CAST(7*sxy - sx*sy AS DOUBLE)/(7*sxx - sx*sx) END"""

  /** Vocabulary Jaccard between two sources from exact set sizes. */
  private val JacExpr: String = "CAST(inter AS DOUBLE)/(n1 + n2 - inter)"

  /** Element-wise double sum chains for the embedding oracles — the
    * left-to-right `+` chain matches the custom expression's strict
    * sequential fold (the annSql discipline).
    */
  private def dotSql(a: String, b: String, d: Int): String =
    (1 to d).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** Graded-gain DCG contribution at one rank: (2^rel − 1)/log2(r+1)
    * — small-int power and a log2, identical token for token on both
    * engines; the ndcg@r read divides two cumulative sums of these.
    */
  private val DcgPartExpr: String =
    "(pow(2, rel) - 1)/log2(vrank + 1)"
  private val IdcgPartExpr: String =
    "(pow(2, irel) - 1)/log2(vrank + 1)"

  /** Day-of-week seasonal index: (per-dow mean)/(per-type mean) =
    * s_d·n_t / (n_d·s_t) from exact integer sums, one closing
    * expression.
    */
  private val SeasonalIdxExpr: String =
    """CASE WHEN s_t = 0 THEN NULL
       ELSE (CAST(s_d AS DOUBLE) * n_t) / (CAST(n_d AS DOUBLE) * s_t) END"""

  /** Clamped value band shared by the confusion-matrix queries: the
    * "actual" class of an event, and — applied to a deterministically
    * perturbed value — its "predicted" class. Both engines evaluate
    * the identical floor/clamp pipeline, so class assignment can
    * never disagree. Shared with the streaming accuracy monitor
    * ([[graft.streaming.EventStreams.accuracyMonitor]]).
    */
  private[graft] def band(x: String): String =
    s"CAST(least(greatest(floor(($x)/125), 0), 3) AS BIGINT)"
  private[graft] val PredNoise = "(pmod(event_id, 7) - 3) * 15"
  private val PredNoiseSql = "((event_id % 7) - 3) * 15"

  /** (pred, act, cnt) confusion-cell counts: one scan, one map-side-
    * combining hash agg on a ≤16-cell key space.
    */
  private def confusionCells(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr(band("value")).as("act"),
        expr(band(s"value + $PredNoise")).as("pred"))
      .groupBy("pred", "act").agg(count(lit(1)).as("cnt"))

  private val confusionCellsSql: String =
    s"""SELECT ${band("value")} AS act,
          ${band(s"value + $PredNoiseSql")} AS pred,
          CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Population Stability Index between two deterministic halves of
    // the event stream (even/odd event_id standing in for the
    // reference-window vs current-window split a deployment would
    // use). One scan → 10-bin conditional-count hash agg + a 1-row
    // totals broadcast; the PSI read-out is per-bin rows (the global
    // PSI is their sum — left to the reader so no cross-engine float
    // summation order exists).
    "q_psi" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        pmod(col("event_id"), lit(2)).as("side"),
        least(floor(col("value") / 50), lit(9)).cast("long").as("bin"))
      val binned = e.groupBy("bin").agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
      val tot = e.agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("ta"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("tb"))
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("a"), col("b"),
          expr(PsiPartExpr).as("psi_part"))
    }),

    // Vocabulary drift as per-token Jensen-Shannon contributions
    // between two corpus halves — which tokens explain the
    // distribution shift, not just that it shifted. Token rows rank
    // by exact total count (ties by term), never by the float
    // contribution, so the top-50 cut is bit-stable cross-engine.
    "q_js_div" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(
        pmod(col("doc_id"), lit(2)).as("side"),
        explode(TextOps.words(col("text"))).as("term"))
      val counts = toks.groupBy("term").agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
      val tot = toks.agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("ta"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("tb"))
      counts.crossJoin(broadcast(tot))
        .orderBy((col("a") + col("b")).desc, col("term").asc)
        .limit(50)
        .select(col("term"), col("a"), col("b"),
          expr(JsdPartExpr).as("jsd_part"))
    }),

    // Per-class confusion-matrix metrics for a deterministic
    // value-band classifier (actual = banded value, predicted =
    // banded perturbed value). The ≤16-cell count frame is the only
    // thing that crosses the exchange; per-class tp/fp/fn derive from
    // it with tiny-frame aggregations — no second scan, no join back
    // to the events.
    "q_confusion" -> ((s, d) => {
      val cells = confusionCells(s, d).persist()
      val perPred = cells.groupBy(col("pred").as("cls"))
        .agg(sum("cnt").as("pred_tot"))
      val perAct = cells.groupBy(col("act").as("cls"))
        .agg(sum("cnt").as("act_tot"))
      val diag = cells.filter(col("pred") === col("act"))
        .select(col("pred").as("cls"), col("cnt").as("tp0"))
      perPred.join(perAct, Seq("cls"), "full_outer")
        .join(diag, Seq("cls"), "left_outer")
        .select(col("cls"),
          coalesce(col("tp0"), lit(0L)).as("tp"),
          (coalesce(col("pred_tot"), lit(0L)) -
            coalesce(col("tp0"), lit(0L))).as("fp"),
          (coalesce(col("act_tot"), lit(0L)) -
            coalesce(col("tp0"), lit(0L))).as("fn"))
        .withColumn("precision_", expr(
          "CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE)/(tp + fp) END"))
        .withColumn("recall_", expr(
          "CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE)/(tp + fn) END"))
        .withColumn("f1", expr(
          "CASE WHEN 2*tp + fp + fn = 0 THEN NULL " +
            "ELSE CAST(2*tp AS DOUBLE)/(2*tp + fp + fn) END"))
    }),

    // Cohen's kappa (chance-corrected agreement) over the same
    // confusion cells — one row of exact sufficient statistics and
    // one closing division. The class-marginal products fold in
    // DECIMAL(38): n² outgrows long at ~3e9 rows (single-digit-TB
    // territory), so 128-bit partials are the correct-at-scale shape.
    "q_kappa" -> ((s, d) => {
      val cells = confusionCells(s, d).persist()
      val marg = cells.groupBy(col("pred").as("cls"))
        .agg(sum("cnt").as("pred_tot"))
        .join(cells.groupBy(col("act").as("cls"))
          .agg(sum("cnt").as("act_tot")), Seq("cls"), "full_outer")
        .agg(sum(coalesce(col("pred_tot"), lit(0L)).cast("decimal(19,0)") *
          coalesce(col("act_tot"), lit(0L)).cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("s_prod"))
      val agree = cells.agg(
        sum("cnt").as("n"),
        sum(when(col("pred") === col("act"), col("cnt")).otherwise(0L))
          .as("s_diag"))
      agree.crossJoin(broadcast(
          marg.select(col("s_prod").cast("double").as("s_prod_d"))))
        .select(col("n"), col("s_diag"), col("s_prod_d"),
          expr(KappaExpr).as("kappa"))
    }),

    // Schema-evolution union: v1 rows (written before the `priority`
    // column existed) append to v2 rows by NAME, missing columns
    // null-filled — Spark's unionByName(allowMissingColumns) against
    // DuckDB's UNION ALL BY NAME. The everyday shape of reading a
    // parquet lake whose schema grew mid-history.
    "q_schema_evolve" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val v1 = o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("total_cents"))
      val v2 = o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("total_cents"),
          col("o_orderpriority").as("priority"))
      v1.unionByName(v2, allowMissingColumns = true)
    }),

    // Zone-map (data-skipping statistics) construction: per-block
    // min/max/count of the ship date over l_orderkey div 4096 blocks,
    // plus whether a 1995 date-range predicate could prune the block.
    // This is the scan-side pruning the engine's own parquet reader
    // does with row-group stats, materialized as a queryable table —
    // the basis for file-skipping manifests at 100 TB. One scan, one
    // hash agg on the block key (keys are non-negative, so integer
    // div agrees cross-engine).
    "q_zonemap" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(expr("l_orderkey div 4096").as("block_id"),
          col("l_shipdate"))
        .groupBy("block_id")
        .agg(count(lit(1)).as("n_rows"),
          date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
          date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"))
        .withColumn("prunable_1995",
          (col("max_ship") < lit("1995-01-01") ||
            col("min_ship") > lit("1995-12-31")).cast("long"))),

    // Linear-interpolation gap fill over the per-type daily value
    // series (anchors = every 3rd day; interpolated days carry the
    // exact integer-numerator closing division). The generative twin
    // of q_gapfill's forward fill: resampling sparse telemetry onto a
    // dense calendar. Window partitions by type (the calendar-bounded
    // daily frame); sequence fan-out is bounded by the anchor stride.
    "q_interp_linear" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("dn"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "dn").agg(sum("cents").as("v"))
        .filter(pmod(col("dn"), lit(3)) === 0)
      val w = Window.partitionBy("event_type").orderBy("dn")
      daily
        .withColumn("nd", lead(col("dn"), 1).over(w))
        .withColumn("nv", lead(col("v"), 1).over(w))
        .select(col("event_type"), col("dn"), col("v"), col("nd"), col("nv"),
          explode(sequence(col("dn"),
            coalesce(col("nd") - 1, col("dn")))).as("day"))
        .select(col("event_type"), col("day").cast("long").as("day_n"),
          expr(InterpExpr).as("v_interp"),
          (col("day") === col("dn")).cast("long").as("is_anchor"))
    }),

    // Vocabulary coverage curve: cumulative share of all token
    // occurrences covered by the top-k terms — the read-out that
    // sizes a tokenizer vocabulary ("how many terms cover 95%?").
    // Ranked by exact integer counts (ties by term); the rank/cumsum
    // windows run AFTER the top-1000 TakeOrdered cut (bounded frame,
    // allowlisted), the corpus total rides a 1-row broadcast, and the
    // term-count frame is persisted across its two consumers.
    "q_vocab_coverage" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(TextOps.words(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .persist()
      val tot = tf.agg(sum("cnt").as("tot"))
      val w = Window.orderBy(col("cnt").desc, col("term"))
      tf.orderBy(col("cnt").desc, col("term")).limit(1000)
        .withColumn("vrank", row_number().over(w).cast("long"))
        .withColumn("cum_cnt", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("vrank"), col("term"), col("cnt"), col("cum_cnt"),
          expr(CovExpr).as("coverage"))
    }),

    // Day-of-week seasonal index per event type: the per-weekday mean
    // value over the per-type mean, from exact integer cents sums.
    // Weekday classes come from epoch-day arithmetic (dn % 7,
    // Thursday = 0) — engine-proof, where calendar DOW functions
    // disagree on numbering conventions. One scan → ≤(types×7)-row
    // agg; per-type totals ride a window over that tiny frame,
    // PARTITIONED by type.
    "q_seasonal_index" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
      Tables.events(s, d)
        .select(col("event_type"),
          pmod(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))),
            lit(7)).cast("long").as("dow7"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "dow7")
        .agg(count(lit(1)).as("n_d"), sum("cents").as("s_d"))
        .withColumn("n_t", sum("n_d").over(w))
        .withColumn("s_t", sum("s_d").over(w))
        .select(col("event_type"), col("dow7"), col("n_d"), col("s_d"),
          expr(SeasonalIdxExpr).as("idx"))
    }),

    // Reciprocal-rank fusion of two retrieval rankings (here: length
    // and lexical-richness orderings — integer keys, doc_id
    // tie-break, so both top-100 lists are bit-stable). Each list is
    // a TakeOrdered top-k; the rank windows run AFTER the limit, over
    // ≤100 rows (allowlisted); the fusion is one tiny full-outer
    // join. RRF scores involve only +/÷ of small ints, so ordering by
    // the float is safe cross-engine (no transcendental in sight).
    "q_rrf" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(TextOps.words(col("text"))).cast("long").as("wc"))
        .persist()
      val wa = Window.orderBy(col("n_chars").desc, col("doc_id"))
      val wb = Window.orderBy(col("wc").desc, col("doc_id"))
      val ra = base.orderBy(col("n_chars").desc, col("doc_id")).limit(100)
        .withColumn("ra", row_number().over(wa).cast("long"))
        .select("doc_id", "ra")
      val rb = base.orderBy(col("wc").desc, col("doc_id")).limit(100)
        .withColumn("rb", row_number().over(wb).cast("long"))
        .select("doc_id", "rb")
      ra.join(rb, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("ra"), col("rb"),
          expr(RrfExpr).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    }),

    // Gains/lift curve over descending score bands: cumulative
    // population share vs cumulative conversion capture per value
    // bin, from exact integers (the ranked-targeting read-out that
    // tells you "the top 20% of scores captures X% of conversions").
    // One scan → 10-bin hash agg; the cumulative window runs over the
    // ≤10-row bin frame (allowlisted) and totals ride a 1-row
    // broadcast.
    "q_gains" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select(least(floor(col("value") / 50), lit(9)).cast("long")
            .as("bin"),
          (col("event_type") === "purchase").cast("long").as("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .persist()
      val w = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = g.agg(sum("n").as("tn"), sum("pos").as("tp"))
      g.withColumn("cum_n", sum("n").over(w))
        .withColumn("cum_pos", sum("pos").over(w))
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("pos"),
          col("cum_n"), col("cum_pos"),
          expr(PopShareExpr).as("pop_share"),
          expr(CaptureExpr).as("capture"),
          expr(LiftExpr).as("lift"))
    }),

    // TPC-H Q5-flavored five-table join: revenue per nation for one
    // region and one order year. The join layering is the point:
    // region→nation broadcast into customer, customer and supplier
    // broadcast-pruned into the orders⨝lineitem shuffle joins, the
    // nation-colocation predicate (c_nationkey = s_nationkey) applied
    // as a join condition, decimal-exact revenue. At 100 TB the only
    // wide exchanges are on orderkey — dimension pruning rides
    // broadcasts.
    "q_join5" -> ((s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val c = Tables.customer(s, d)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      val o = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1996)
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Malformed-JSON quarantine triage: per event type, how many
    // payloads parse and the exact sum of the parsed field —
    // PERMISSIVE from_json (null struct on bad rows) vs DuckDB
    // json_valid. A deterministic 10% corruption (truncate the
    // closing byte) stands in for wire damage; the triage is one
    // scan + one hash agg — the ingest-side dead-letter accounting
    // every pipeline needs.
    "q_json_quarantine" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          when(pmod(col("event_id"), lit(10)) === 0,
            expr("substring(props, 1, length(props) - 1)"))
            .otherwise(col("props")).as("raw"))
        .withColumn("parsed",
          from_json(col("raw"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("_corrupt_record",
              org.apache.spark.sql.types.StringType))),
            Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("parsed._corrupt_record").isNull.cast("long"))
            .as("n_valid"),
          sum(col("parsed._corrupt_record").isNotNull.cast("long"))
            .as("n_invalid"),
          sum(coalesce(col("parsed.k"), lit(0L))).as("k_sum"))),

    // NDCG@r curve of a system ranking (lexical richness) against
    // graded relevance (length bands): per rank 1..20, the DCG and
    // ideal-DCG contributions and their running ratio. Both rankings
    // are integer-keyed TakeOrdered top-20s; the per-rank windows run
    // after the limits (≤20-row frames); gains are small-int powers
    // over a log2 — token-identical cross-engine.
    "q_ndcg" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("wc"),
          least(expr("n_chars div 150"), lit(3)).cast("long").as("rel"))
        .persist()
      val ws = Window.orderBy(col("wc").desc, col("doc_id"))
      val wi = Window.orderBy(col("rel").desc, col("doc_id"))
      val sys = base.orderBy(col("wc").desc, col("doc_id")).limit(20)
        .withColumn("vrank", row_number().over(ws).cast("long"))
        .select(col("vrank"), col("doc_id"), col("rel"))
      val ideal = base.orderBy(col("rel").desc, col("doc_id")).limit(20)
        .withColumn("vrank", row_number().over(wi).cast("long"))
        .select(col("vrank"), col("rel").as("irel"))
      val wc2 = Window.orderBy("vrank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sys.join(ideal, "vrank")
        .withColumn("dcg_part", expr(DcgPartExpr))
        .withColumn("idcg_part", expr(IdcgPartExpr))
        .withColumn("cum_dcg", sum("dcg_part").over(wc2))
        .withColumn("cum_idcg", sum("idcg_part").over(wc2))
        .select(col("vrank"), col("doc_id"), col("rel"), col("irel"),
          col("dcg_part"), col("idcg_part"),
          expr("cum_dcg / cum_idcg").as("ndcg_at_r"))
    }),

    // Leave-one-out target encoding of the value band against the
    // conversion flag — the categorical-feature encoding that doesn't
    // leak the row's own label. Group sufficient statistics (10 rows)
    // broadcast back onto the scan; the encoding itself is a
    // shuffle-free codegen'd projection (the zscore shape).
    "q_target_encode" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"),
          least(floor(col("value") / 50), lit(9)).cast("long").as("bin"),
          (col("event_type") === "purchase").cast("long").as("y"))
      val g = e.groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("s_b"))
      e.join(broadcast(g), "bin")
        .select(col("event_id"), col("bin"), col("y"),
          expr(LooExpr).as("y_loo"))
    }),

    // Rolling 7-observed-day OLS trend slope per event type: exact
    // integer power sums (Σx, Σy, Σxy, Σx²) over the trailing window
    // of the daily summary — q_burst's calendar-bounded frame with
    // the q_ols_fit closed form on top. Emits NULL until the window
    // fills.
    "q_rolling_slope" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("dn")
        .rowsBetween(-6, 0)
      Tables.events(s, d)
        .select(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("dn"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "dn").agg(sum("cents").as("y"))
        .withColumn("cw", count(lit(1)).over(w))
        .withColumn("sx", sum(col("dn").cast("long")).over(w))
        .withColumn("sy", sum("y").over(w))
        .withColumn("sxy", sum(col("dn").cast("long") * col("y")).over(w))
        .withColumn("sxx",
          sum(col("dn").cast("long") * col("dn").cast("long")).over(w))
        .select(col("event_type"), col("dn").cast("long").as("day_n"),
          col("y"), expr(SlopeExpr).as("slope"))
    }),

    // IQR outlier detection per group: Tukey's 1.5·IQR whiskers with
    // FULLY integer comparisons — v < q1 − 1.5(q3−q1) ⇔
    // 2v < 5q1 − 3q3 — so no float boundary exists anywhere.
    // Quartiles come from the scale-safe cumDist (ceil-rank
    // convention); thresholds broadcast back onto the scan and the
    // flags fold in the same pass.
    "q_outlier_iqr" -> ((s, d) => {
      val t = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("v"))
        .persist()
      val th = graft.ops.Quantiles.cumDist(t, col("g"), col("v"))
        .groupBy("g")
        .agg(min(when(col("cum") * 4 >= col("n"), col("v"))).as("q1"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("q3"))
      t.join(broadcast(th), "g")
        .groupBy(col("g").as("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          min("q1").as("q1"), min("q3").as("q3"),
          sum((lit(2) * col("v") < lit(5) * col("q1") - lit(3) * col("q3"))
            .cast("long")).as("n_low"),
          sum((lit(2) * col("v") > lit(5) * col("q3") - lit(3) * col("q1"))
            .cast("long")).as("n_high"))
    }),

    // Measured Bloom-filter false-positive rate: the bloom
    // prefilter's pass count against the exact semi-join truth,
    // certified within the sizing's nominal bound (the
    // price-the-approximation discipline of q_ann_recall and the
    // ε-bounded sketch oracles — bloom bit patterns aren't
    // cross-engine replicable, so the exact counts hash-verify and
    // the margin check rides as a boolean).
    "q_bloom_fpr" -> ((s, d) => {
      val probe = Tables.lineitem(s, d).select(col("l_partkey"))
      val build = Tables.part(s, d).filter(col("p_size") === 15)
        .select(col("p_partkey"))
      val nProbe = probe.agg(count(lit(1)).as("n_probe"))
      val nTrue = probe.join(build, probe("l_partkey") === build("p_partkey"),
        "left_semi").agg(count(lit(1)).as("n_true"))
      val nPass = graft.ops.BloomJoin
        .bloomPrefilter(probe, build, "l_partkey", "p_partkey", 100000L)
        .agg(count(lit(1)).as("n_pass"))
      nProbe.crossJoin(broadcast(nTrue)).crossJoin(broadcast(nPass))
        .select(col("n_probe"), col("n_true"),
          (col("n_pass") - col("n_true") <=
            (col("n_probe") - col("n_true")).cast("double") * 0.05)
            .as("fpr_within_bound"))
    }),

    // Shuffle-key skew profile: the frequency histogram of the
    // user_id key in log2 buckets (exact ilog2 via length(bin(n))−1,
    // the dsir discipline) with each bucket's share of all events —
    // the diagnostic that says whether a user-keyed shuffle needs
    // salting BEFORE the job hits it. One key-count agg, one ≤64-row
    // bucket agg, a 1-row total broadcast.
    "q_key_skew" -> ((s, d) => {
      val pk = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .persist()
      val tot = pk.agg(sum("cnt").as("tot"))
      pk.withColumn("bucket",
          expr("CAST(length(bin(cnt)) - 1 AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_keys"), sum("cnt").as("sum_events"),
          min("cnt").as("min_cnt"), max("cnt").as("max_cnt"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_keys"), col("sum_events"),
          col("min_cnt"), col("max_cnt"),
          expr("CAST(sum_events AS DOUBLE)/tot").as("event_share"))
    }),

    // Matryoshka truncation pricing: for the eval queries' exact
    // top-5 neighbors, the cosine at full dimension vs the first half
    // of the vector — the measured answer to "can we store half the
    // embedding". Composes the brute-force anchor (BNL-allowlisted
    // via q_ann_cosine's shape) with two slice-cosines; all folds are
    // the strict sequential custom expression, mirrored element by
    // element in the oracle.
    "q_matryoshka" -> ((s, d) => {
      import graft.ops.Similarity
      val e = Tables.embeddings(s, d)
      val top = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
        k = 5)
      top
        .join(e.select(col("vec_id").as("qid"), col("embedding").as("qv")),
          "qid")
        .join(e.select(col("vec_id").as("nid"), col("embedding").as("nv")),
          "nid")
        .select(col("qid"), col("nid"), col("rank"),
          Similarity.cosine(col("qv"), col("nv")).as("cos_full"),
          Similarity.cosine(slice(col("qv"), 1, 32),
            slice(col("nv"), 1, 32)).as("cos_half"))
    }),

    // Per-source duplicate rate: the share of each source's documents
    // that exact dedup (md5 content hash, keep-lowest-id) would drop
    // — the dataset-health number every ingest dashboard tracks. One
    // digest-keyed window (shuffle on the 16-byte digest, never the
    // text) + one source-keyed hash agg.
    "q_dup_rate" -> ((s, d) => {
      val w = Window.partitionBy("digest")
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          md5(coalesce(col("text"), lit(""))).as("digest"))
        .withColumn("keeper", min("doc_id").over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum((col("doc_id") > col("keeper")).cast("long")).as("n_dup"))
        .select(col("source"), col("n"), col("n_dup"),
          expr("CAST(n_dup AS DOUBLE)/n").as("dup_rate"))
    }),

    // Cross-source vocabulary overlap: distinct-term Jaccard between
    // every source pair — the corpus-mixing diagnostic ("how much of
    // B is already in A"). One distinct (source, term) frame; pair
    // generation groups each term's ≤|sources| membership set and
    // explodes ordered pairs (the posting-list plan, buffer bounded
    // by the source count); set sizes broadcast back.
    "q_source_overlap" -> ((s, d) => {
      val ts = Tables.documents(s, d)
        .select(col("source"), explode(TextOps.words(col("text"))).as("term"))
        .distinct().persist()
      val sizes = ts.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = ts.groupBy("term")
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .select(explode(expr(
          """filter(
               flatten(transform(ss, a ->
                 transform(ss, b -> named_struct('s1', a, 's2', b)))),
               p -> p.s1 < p.s2)""")).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"),
          col("n").as("n1"))), "s1")
        .join(broadcast(sizes.select(col("source").as("s2"),
          col("n").as("n2"))), "s2")
        .select(col("s1"), col("s2"), col("inter"), col("n1"), col("n2"),
          expr(JacExpr).as("jaccard"))
    }),

    // Conversion-lag percentiles: per user, the first purchase at or
    // after their first view; the latency distribution read out as
    // exact integer-millisecond p50/p90 (conditional-min reads over
    // the pooled scale-safe cumDist) plus the exact mean. Two hash
    // aggs on user_id (co-keyed, AQE co-locates) — min-lag equals
    // lag-of-min-ts since ts ≥ first_view, so the join side never
    // carries more than one row per user into the agg.
    "q_conversion_lag" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v"))
      val lag = ev.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("ts") >= col("v"))
        .groupBy("user_id")
        .agg(min(unix_millis(col("ts")) - unix_millis(col("v")))
          .as("lag_ms"))
        .persist()
      val cd = graft.ops.Quantiles.cumDist(lag, lit("all"), col("lag_ms"))
      val reads = cd.agg(
        min(when(col("cum") * 2 >= col("n"), col("v"))).as("p50_ms"),
        min(when(col("cum") * 10 >= col("n") * 9, col("v"))).as("p90_ms"))
      lag.agg(count(lit(1)).as("n_conv"), sum("lag_ms").as("sum_ms"))
        .crossJoin(broadcast(reads))
        .select(col("n_conv"), col("p50_ms"), col("p90_ms"),
          expr("CAST(sum_ms AS DOUBLE)/n_conv").as("mean_ms"))
    }),

    // Isotonic regression (PAVA) of the conversion rate over score
    // bins — the calibration step that forces "higher score ⇒ no
    // lower conversion" before using scores as probabilities. The
    // minimax closed form fitted(i) = max_{j≤i} min_{k≥i} mean(j..k)
    // evaluates over the ≤10-row bin frame: prefix sums, a tiny
    // broadcast pair cross (≤100 rows), an i-explode (≤1000 rows),
    // two hash aggs. Segment means are single divisions of exact
    // integers, so the minimax comparisons agree cross-engine. At any
    // corpus size the post-scan work is constant — the scan is the
    // only data-sized stage.
    "q_isotonic" -> ((s, d) =>
      graft.ops.Classifier.isotonicRates(
        Tables.events(s, d)
          .select(least(floor(col("value") / 50), lit(9)).cast("long")
              .as("bin"),
            (col("event_type") === "purchase").cast("long").as("y"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("y").as("pos"))
          .persist())),

    // Quantile normalization across sources: each (event_type, value)
    // maps onto the POOLED distribution's value at the equivalent
    // rank — the batch-effect removal / cross-source score-alignment
    // step before mixing corpora. See
    // [[graft.ops.Features.quantileNormalize]]: one corpus scan
    // (pooled CDF derives from the per-group CDF as a weighted
    // cumDist), integer ceiling target ranks, interval point-join.
    "q_quantile_norm" -> ((s, d) =>
      graft.ops.Features.quantileNormalize(
        Tables.events(s, d), col("event_type"),
        floor(col("value") * 100).cast("long"))
        .withColumnRenamed("g", "event_type")),

    // Tf-weighted document cosine pairs — see
    // [[graft.ops.Relevance.tfCosinePairs]] (df-pruned geometry,
    // semi-join-bounded posting buffers, exact integer threshold
    // 4·dot² ≥ n1·n2 ⇔ cosine ≥ 0.5).
    "q_tf_cosine" -> ((s, d) =>
      graft.ops.Relevance.tfCosinePairs(
        Tables.documents(s, d), "doc_id", "text", maxDf = 64L)))

  /** DuckDB tokenizer twin of [[TextOps.words]] (see OpsQueries). */
  private val ws =
    "list_filter(string_split(COALESCE(text, ''), ' '), w -> w <> '')"

  val oracleSql: Map[String, String] = Map(
    "q_psi" ->
      s"""WITH e AS (SELECT event_id % 2 AS side,
              CAST(least(floor(value/50), 9) AS BIGINT) AS bin FROM events),
          binned AS (SELECT bin,
              CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
            FROM e GROUP BY bin),
          tot AS (SELECT
              CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ta,
              CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tb
            FROM e)
          SELECT bin, a, b, $PsiPartExpr AS psi_part FROM binned, tot""",

    "q_js_div" ->
      s"""WITH toks AS (SELECT doc_id % 2 AS side, unnest($ws) AS term
            FROM documents),
          counts AS (SELECT term,
              CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
            FROM toks GROUP BY term),
          tot AS (SELECT
              CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ta,
              CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tb
            FROM toks),
          top AS (SELECT term, a, b FROM counts
            ORDER BY a + b DESC, term ASC LIMIT 50)
          SELECT term, a, b, $JsdPartExpr AS jsd_part FROM top, tot""",

    "q_confusion" ->
      s"""WITH cells AS ($confusionCellsSql),
          per_pred AS (SELECT pred AS cls, CAST(sum(cnt) AS BIGINT) AS pred_tot
            FROM cells GROUP BY pred),
          per_act AS (SELECT act AS cls, CAST(sum(cnt) AS BIGINT) AS act_tot
            FROM cells GROUP BY act),
          diag AS (SELECT pred AS cls, CAST(cnt AS BIGINT) AS tp0
            FROM cells WHERE pred = act),
          j AS (SELECT COALESCE(per_pred.cls, per_act.cls) AS cls,
              COALESCE(tp0, 0) AS tp,
              COALESCE(pred_tot, 0) - COALESCE(tp0, 0) AS fp,
              COALESCE(act_tot, 0) - COALESCE(tp0, 0) AS fn
            FROM per_pred FULL OUTER JOIN per_act
              ON per_pred.cls = per_act.cls
            LEFT JOIN diag ON COALESCE(per_pred.cls, per_act.cls) = diag.cls)
          SELECT cls, tp, fp, fn,
            CASE WHEN tp + fp = 0 THEN NULL
              ELSE CAST(tp AS DOUBLE)/(tp + fp) END AS precision_,
            CASE WHEN tp + fn = 0 THEN NULL
              ELSE CAST(tp AS DOUBLE)/(tp + fn) END AS recall_,
            CASE WHEN 2*tp + fp + fn = 0 THEN NULL
              ELSE CAST(2*tp AS DOUBLE)/(2*tp + fp + fn) END AS f1
          FROM j""",

    "q_kappa" ->
      s"""WITH cells AS MATERIALIZED ($confusionCellsSql),
          per_pred AS (SELECT pred AS cls, CAST(sum(cnt) AS BIGINT) AS pred_tot
            FROM cells GROUP BY pred),
          per_act AS (SELECT act AS cls, CAST(sum(cnt) AS BIGINT) AS act_tot
            FROM cells GROUP BY act),
          marg AS (SELECT CAST(CAST(sum(
              CAST(COALESCE(pred_tot, 0) AS DECIMAL(19,0)) *
              CAST(COALESCE(act_tot, 0) AS DECIMAL(19,0))) AS DECIMAL(38,0))
              AS DOUBLE) AS s_prod_d
            FROM per_pred FULL OUTER JOIN per_act
              ON per_pred.cls = per_act.cls),
          agree AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(CASE WHEN pred = act THEN cnt ELSE 0 END) AS BIGINT)
                AS s_diag
            FROM cells)
          SELECT n, s_diag, s_prod_d, $KappaExpr AS kappa
          FROM agree, marg""",

    "q_schema_evolve" ->
      """SELECT o_orderkey, o_custkey,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
            CAST(NULL AS VARCHAR) AS priority
          FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_custkey,
            CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
            o_orderpriority AS priority
          FROM orders WHERE o_orderkey % 2 = 1""",

    "q_zonemap" ->
      """SELECT l_orderkey // 4096 AS block_id,
            count(*) AS n_rows,
            strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
            strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship,
            CAST(strftime(max(l_shipdate), '%Y-%m-%d') < '1995-01-01'
              OR strftime(min(l_shipdate), '%Y-%m-%d') > '1995-12-31'
              AS BIGINT) AS prunable_1995
          FROM lineitem GROUP BY 1""",

    "q_interp_linear" ->
      s"""WITH daily AS (SELECT event_type,
              datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1, 2),
          anchors AS (SELECT event_type, dn, v,
              lead(dn) OVER (PARTITION BY event_type ORDER BY dn) AS nd,
              lead(v) OVER (PARTITION BY event_type ORDER BY dn) AS nv
            FROM daily WHERE dn % 3 = 0),
          expanded AS (SELECT event_type, dn, v, nd, nv,
              unnest(generate_series(dn, COALESCE(nd - 1, dn))) AS day
            FROM anchors)
          SELECT event_type, CAST(day AS BIGINT) AS day_n,
            $InterpExpr AS v_interp,
            CAST(day = dn AS BIGINT) AS is_anchor
          FROM expanded""",

    "q_vocab_coverage" ->
      s"""WITH tf AS MATERIALIZED (SELECT term, count(*) AS cnt
            FROM (SELECT unnest($ws) AS term FROM documents) GROUP BY 1),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM tf),
          top AS (SELECT term, CAST(cnt AS BIGINT) AS cnt FROM tf
            ORDER BY cnt DESC, term LIMIT 1000),
          r AS (SELECT term, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, term)
                AS BIGINT) AS vrank,
              CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cnt
            FROM top)
          SELECT vrank, term, cnt, cum_cnt, $CovExpr AS coverage
          FROM r, tot""",

    "q_seasonal_index" ->
      s"""WITH e AS (SELECT event_type,
              CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                AS BIGINT) AS dow7,
              CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
          g AS (SELECT event_type, dow7, CAST(count(*) AS BIGINT) AS n_d,
              CAST(sum(cents) AS BIGINT) AS s_d
            FROM e GROUP BY 1, 2),
          t AS (SELECT *,
              CAST(sum(n_d) OVER (PARTITION BY event_type) AS BIGINT) AS n_t,
              CAST(sum(s_d) OVER (PARTITION BY event_type) AS BIGINT) AS s_t
            FROM g)
          SELECT event_type, dow7, n_d, s_d, $SeasonalIdxExpr AS idx
          FROM t""",

    "q_rrf" ->
      s"""WITH base AS MATERIALIZED (SELECT doc_id, n_chars,
              CAST(len($ws) AS BIGINT) AS wc FROM documents),
          r1 AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS ra
            FROM (SELECT * FROM base
              ORDER BY n_chars DESC, doc_id LIMIT 100)),
          r2 AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY wc DESC, doc_id)
                AS BIGINT) AS rb
            FROM (SELECT * FROM base ORDER BY wc DESC, doc_id LIMIT 100)),
          fused AS (SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id, ra, rb
            FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id)
          SELECT doc_id, ra, rb, $RrfExpr AS rrf
          FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""",

    "q_gains" ->
      s"""WITH b AS (SELECT CAST(least(floor(value/50), 9) AS BIGINT) AS bin,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events),
          g AS MATERIALIZED (SELECT bin, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS pos
            FROM b GROUP BY bin),
          c AS (SELECT bin, n, pos,
              CAST(sum(n) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_n,
              CAST(sum(pos) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pos
            FROM g),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
              CAST(sum(pos) AS BIGINT) AS tp FROM g)
          SELECT bin, n, pos, cum_n, cum_pos,
            $PopShareExpr AS pop_share, $CaptureExpr AS capture,
            $LiftExpr AS lift
          FROM c, tot""",

    "q_join5" ->
      """SELECT n_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND s_nationkey = c_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
         GROUP BY n_name""",

    "q_json_quarantine" ->
      """WITH r AS (SELECT event_type,
            CASE WHEN event_id % 10 = 0
              THEN substring(props, 1, length(props) - 1)
              ELSE props END AS raw
          FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN json_valid(raw) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_valid,
          CAST(sum(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_invalid,
          CAST(sum(CASE WHEN json_valid(raw)
            THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
            ELSE 0 END) AS BIGINT) AS k_sum
        FROM r GROUP BY event_type""",

    "q_ndcg" ->
      s"""WITH base AS MATERIALIZED (SELECT doc_id,
              CAST(len($ws) AS BIGINT) AS wc,
              CAST(least(n_chars // 150, 3) AS BIGINT) AS rel
            FROM documents),
          sys AS (SELECT doc_id, rel,
              CAST(row_number() OVER (ORDER BY wc DESC, doc_id)
                AS BIGINT) AS vrank
            FROM (SELECT * FROM base ORDER BY wc DESC, doc_id LIMIT 20)),
          ideal AS (SELECT rel AS irel,
              CAST(row_number() OVER (ORDER BY rel DESC, doc_id)
                AS BIGINT) AS vrank
            FROM (SELECT * FROM base ORDER BY rel DESC, doc_id LIMIT 20)),
          parts AS (SELECT vrank, doc_id, rel, irel,
              $DcgPartExpr AS dcg_part, $IdcgPartExpr AS idcg_part
            FROM sys JOIN ideal USING (vrank)),
          cums AS (SELECT *,
              sum(dcg_part) OVER (ORDER BY vrank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_dcg,
              sum(idcg_part) OVER (ORDER BY vrank
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_idcg
            FROM parts)
          SELECT vrank, doc_id, rel, irel, dcg_part, idcg_part,
            cum_dcg / cum_idcg AS ndcg_at_r
          FROM cums""",

    "q_target_encode" ->
      s"""WITH e AS MATERIALIZED (SELECT event_id,
              CAST(least(floor(value/50), 9) AS BIGINT) AS bin,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events),
          g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
              CAST(sum(y) AS BIGINT) AS s_b FROM e GROUP BY bin)
          SELECT event_id, e.bin, CAST(y AS BIGINT) AS y,
            $LooExpr AS y_loo
          FROM e JOIN g ON e.bin = g.bin""",

    "q_rolling_slope" ->
      s"""WITH daily AS (SELECT event_type,
              datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
              CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          win AS (SELECT event_type, dn, y,
              CAST(count(*) OVER w AS BIGINT) AS cw,
              CAST(sum(dn) OVER w AS BIGINT) AS sx,
              CAST(sum(y) OVER w AS BIGINT) AS sy,
              CAST(sum(dn * y) OVER w AS BIGINT) AS sxy,
              CAST(sum(dn * dn) OVER w AS BIGINT) AS sxx
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY dn
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
          SELECT event_type, CAST(dn AS BIGINT) AS day_n, y,
            $SlopeExpr AS slope
          FROM win""",

    "q_outlier_iqr" ->
      """WITH t AS MATERIALIZED (SELECT l_returnflag AS g,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS v
          FROM lineitem),
        d AS (SELECT g, v, count(*) AS cnt FROM t GROUP BY 1, 2),
        c AS (SELECT g, v,
            CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
            CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
          FROM d),
        th AS (SELECT g,
            min(CASE WHEN cum*4 >= n THEN v END) AS q1,
            min(CASE WHEN cum*4 >= n*3 THEN v END) AS q3
          FROM c GROUP BY g)
        SELECT t.g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
          q1, q3,
          CAST(sum(CASE WHEN 2*t.v < 5*th.q1 - 3*th.q3
            THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
          CAST(sum(CASE WHEN 2*t.v > 5*th.q3 - 3*th.q1
            THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        FROM t JOIN th ON t.g = th.g GROUP BY t.g, q1, q3""",

    "q_bloom_fpr" ->
      """WITH b AS (SELECT DISTINCT p_partkey FROM part WHERE p_size = 15),
          np AS (SELECT CAST(count(*) AS BIGINT) AS n_probe FROM lineitem),
          nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM b))
          SELECT n_probe, n_true, TRUE AS fpr_within_bound FROM np, nt""",

    "q_key_skew" ->
      """WITH pk AS MATERIALIZED (SELECT user_id, count(*) AS cnt
            FROM events GROUP BY 1),
          h AS (SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(cnt) AS BIGINT) AS sum_events,
              CAST(min(cnt) AS BIGINT) AS min_cnt,
              CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM pk GROUP BY 1),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM pk)
          SELECT bucket, n_keys, sum_events, min_cnt, max_cnt,
            CAST(sum_events AS DOUBLE)/tot AS event_share
          FROM h, tot""",

    "q_matryoshka" -> {
      val dot = dotSql("qv", "nv", 64)
      val qn = dotSql("qv", "qv", 64)
      val nn = dotSql("nv", "nv", 64)
      val dotH = dotSql("qv", "nv", 32)
      val qnH = dotSql("qv", "qv", 32)
      val nnH = dotSql("nv", "nv", 32)
      s"""WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings
            WHERE vec_id < 10),
          c AS (SELECT vec_id nid, embedding nv FROM embeddings),
          s AS (SELECT qid, nid,
              ($dot) / (sqrt($qn) * sqrt($nn)) AS cos_full,
              ($dotH) / (sqrt($qnH) * sqrt($nnH)) AS cos_half
            FROM c, q WHERE nid <> qid),
          r AS (SELECT qid, nid, cos_full, cos_half,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY cos_full DESC, nid) AS rn
            FROM s)
          SELECT qid, nid, CAST(rn AS BIGINT) AS rank, cos_full, cos_half
          FROM r WHERE rn <= 5"""
    },

    "q_dup_rate" ->
      """WITH h AS (SELECT source, doc_id,
            md5(COALESCE(text, '')) AS digest,
            min(doc_id) OVER (PARTITION BY md5(COALESCE(text, '')))
              AS keeper
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN doc_id > keeper THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup,
          CAST(sum(CASE WHEN doc_id > keeper THEN 1 ELSE 0 END)
            AS DOUBLE)/count(*) AS dup_rate
        FROM h GROUP BY source""",

    "q_source_overlap" ->
      s"""WITH ts AS MATERIALIZED (SELECT DISTINCT source, term
            FROM (SELECT source, unnest($ws) AS term FROM documents)),
          sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM ts GROUP BY 1),
          ij AS (SELECT a.source AS s1, b.source AS s2,
              CAST(count(*) AS BIGINT) AS inter
            FROM ts a JOIN ts b
              ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2),
          j AS (SELECT s1, s2, inter, x.n AS n1, y.n AS n2
            FROM ij JOIN sizes x ON ij.s1 = x.source
              JOIN sizes y ON ij.s2 = y.source)
          SELECT s1, s2, inter, n1, n2, $JacExpr AS jaccard FROM j""",

    "q_conversion_lag" ->
      """WITH fv AS (SELECT user_id, min(ts) AS v FROM events
            WHERE event_type = 'view' GROUP BY 1),
          lag AS MATERIALIZED (SELECT e.user_id,
              CAST(min(epoch_ms(e.ts) - epoch_ms(fv.v)) AS BIGINT) AS lag_ms
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= fv.v
            GROUP BY 1),
          d AS (SELECT lag_ms, count(*) AS cnt FROM lag GROUP BY 1),
          c AS (SELECT lag_ms,
              CAST(sum(cnt) OVER (ORDER BY lag_ms
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(sum(cnt) OVER () AS BIGINT) AS n
            FROM d),
          reads AS (SELECT
              (SELECT min(lag_ms) FROM c WHERE cum*2 >= n) AS p50_ms,
              (SELECT min(lag_ms) FROM c WHERE cum*10 >= n*9) AS p90_ms),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conv,
              CAST(sum(lag_ms) AS BIGINT) AS sum_ms FROM lag)
          SELECT n_conv, p50_ms, p90_ms,
            CAST(sum_ms AS DOUBLE)/n_conv AS mean_ms
          FROM tot, reads""",

    "q_isotonic" ->
      s"""WITH b AS (SELECT CAST(least(floor(value/50), 9) AS BIGINT) AS bin,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events),
          g AS MATERIALIZED (SELECT bin, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin),
          c AS MATERIALIZED (SELECT bin, n, pos,
              CAST(sum(n) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_n,
              CAST(sum(pos) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pos
            FROM g),
          pairs AS (SELECT js.bin AS j, ks.bin AS k,
              js.cum_n - js.n AS exn, js.cum_pos - js.pos AS exp_,
              ks.cum_n AS kn, ks.cum_pos AS kp
            FROM c js, c ks WHERE js.bin <= ks.bin),
          tri AS (SELECT j, $SegMeanExpr AS m,
              unnest(generate_series(j, k)) AS bin
            FROM pairs),
          inner_min AS (SELECT bin, j, min(m) AS minm
            FROM tri GROUP BY 1, 2),
          fit AS (SELECT bin, max(minm) AS rate_iso
            FROM inner_min GROUP BY 1)
          SELECT g.bin, n, pos, CAST(pos AS DOUBLE)/n AS rate_raw,
            rate_iso
          FROM g JOIN fit ON g.bin = fit.bin""",

    "q_quantile_norm" ->
      """WITH e AS MATERIALIZED (SELECT event_type AS g,
              CAST(floor(value*100) AS BIGINT) AS v FROM events),
          src AS (SELECT g, v, count(*) AS cnt FROM e GROUP BY 1, 2),
          scum AS (SELECT g, v,
              CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_s,
              CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_s
            FROM src),
          pool AS (SELECT v, count(*) AS cnt FROM e GROUP BY 1),
          pcum AS MATERIALIZED (SELECT v, CAST(cnt AS BIGINT) AS cnt,
              CAST(sum(cnt) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_p
            FROM pool),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_p FROM e),
          tgt AS (SELECT g, v, cum_s, n_s,
              (cum_s * n_p + n_s - 1) // n_s AS t FROM scum, tot)
          SELECT g AS event_type, tgt.v AS v, cum_s, n_s, t,
            pcum.v AS v_norm
          FROM tgt JOIN pcum
            ON tgt.t BETWEEN pcum.cum_p - pcum.cnt + 1 AND pcum.cum_p""",

    "q_tf_cosine" ->
      s"""WITH tf0 AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest($ws) AS term FROM documents)
            GROUP BY 1, 2),
          keep AS (SELECT term FROM tf0 GROUP BY term
            HAVING count(*) <= 64),
          tf AS MATERIALIZED (SELECT tf0.* FROM tf0 JOIN keep USING (term)),
          norms AS (SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2
            FROM tf GROUP BY doc_id),
          pairs AS (SELECT t1.doc_id AS d1, t2.doc_id AS d2,
              CAST(sum(t1.tf * t2.tf) AS BIGINT) AS dot
            FROM tf t1 JOIN tf t2 ON t1.term = t2.term
              AND t1.doc_id < t2.doc_id
            GROUP BY 1, 2),
          scored AS (SELECT d1, d2, dot, x.n2 AS n1, y.n2 AS n2
            FROM pairs
              JOIN norms x ON pairs.d1 = x.doc_id
              JOIN norms y ON pairs.d2 = y.doc_id)
          SELECT d1, d2, dot, n1, n2, $CosExpr AS cosine
          FROM scored WHERE dot > 0 AND 4*dot*dot >= n1 * n2""")
}
