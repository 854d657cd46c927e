package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{
  Anomaly, AsOf, BloomJoin, Cohorts, Funnels, FuzzyJoin, Graphs, Moments,
  Prefix, RangeJoin, Scd, Sequences, Sessions, Similarity, Skew,
  SeriesOps, SnapshotDiff, StatTests, Timeseries}

/** Third operator pack: as-of join, embedding near-dup pairs, JSON
  * extraction, rollup, distinct counting, exact positional median.
  * Same oracle-parity discipline as CoreQueries/OpsQueries.
  */
object ExtQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-based batch sessionization (30-min gap) — the batch twin of
    // the streaming sessionize; one shuffle on user_id.
    "q_sessionize" -> ((s, d) =>
      Sessions.sessionize(Tables.events(s, d), "user_id", "ts", "event_id")),

    // The SAME 30-min sessions through Spark's native session_window
    // aggregation (dynamic-gap merging inside the agg operator — one
    // shuffle on the user key, no lag/cumsum window cascade): the
    // engine-primitive twin of q_sessionize, and the exact batch
    // counterpart of streaming session windows. A session merges an
    // event when ts < current_end (= last ts + gap), so the break
    // condition is diff >= gap.
    "q_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_min_id"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
            .as("session_end"),
          col("n_events"), col("first_min_id"))),

    // Hopping (sliding) windows: 1-hour windows every 30 minutes via
    // the built-in window(ts, width, slide) — each event lands in
    // width/slide = 2 overlapping buckets, generated row-side (a
    // Generate, shuffle carries only (window, type) partial counts;
    // no self-join against a window table).
    "q_hopping" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n"))),

    // Ordered funnel signup → click → purchase with a 7-day conversion
    // window: one exchange + one sort for the whole step cascade
    // (see graft.ops.Funnels).
    "q_funnel" -> ((s, d) =>
      Funnels.funnel(Tables.events(s, d), "user_id", "ts", "event_id",
        "event_type", Seq("signup", "click", "purchase"))),

    // Weekly cohort retention: cohort via window-min over the user
    // partition (no second pass over the log), then a two-phase
    // distinct-user count per (cohort, offset) cell.
    "q_retention" -> ((s, d) =>
      Cohorts.weeklyRetention(Tables.events(s, d), "user_id", "ts")),

    // CDC-style snapshot diff: two deterministic order "snapshots"
    // (keys mod-filtered, prices nudged on a third residue class) →
    // per-key added/removed/changed/unchanged.
    "q_snapshot_diff" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val prev = orders
        .filter(pmod(col("o_orderkey"), lit(3L)) =!= 0L)
        .select(col("o_orderkey"), col("o_totalprice"))
      val cur = orders
        .filter(pmod(col("o_orderkey"), lit(5L)) =!= 0L)
        .select(col("o_orderkey"),
          (col("o_totalprice") +
            when(pmod(col("o_orderkey"), lit(7L)) === 0L, lit(1.0))
              .otherwise(lit(0.0))).as("o_totalprice"))
      SnapshotDiff.diffSnapshots(prev, cur, Seq("o_orderkey"), Seq("o_totalprice"))
    }),

    // SCD type-2 history: collapse the event log into per-user
    // event_type validity intervals — one key shuffle, one sort, two
    // windows (see graft.ops.Scd).
    "q_scd2" -> ((s, d) =>
      Scd.scd2History(Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .select(
          col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current").cast("int").cast("long").as("is_current"))),

    // Point-in-time SCD2 lookup: every 37th event probes "which
    // event_type regime was this user in at that instant" against the
    // history built from the full log — key equi-join with the
    // half-open interval test as residual (see Scd.pointInTime).
    "q_scd2_lookup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hist = Scd.scd2History(ev, "user_id", "ts", "event_id", "event_type")
      val facts = ev.filter(pmod(col("event_id"), lit(37L)) === 0L)
      Scd.pointInTime(facts, hist, "user_id", "ts", "event_type")
        .select(
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"))
    }),

    // Pure-range join (no equi-key): ±60s neighbor counts via δ-bin
    // blocking — bin equi-join + residual filter instead of the
    // cartesian Catalyst would otherwise plan (see graft.ops.RangeJoin).
    "q_range_join" -> ((s, d) =>
      RangeJoin.neighborCounts(Tables.events(s, d), "event_id", "ts",
        deltaSeconds = 60L)),

    // Integer PageRank (3 rounds) over the symmetrized supplier↔part
    // bipartite graph from lineitem — entity-importance scoring with
    // exact long arithmetic, so the full iteration hash-matches the
    // unrolled oracle (see graft.ops.Graphs). Node ids: 2·part for
    // parts, 2·supp+1 for suppliers (disjoint id spaces).
    "q_pagerank" -> ((s, d) => {
      // recent-shipments slice: the business question is "who matters
      // NOW", and the filter pushes to the scan — rank cost follows
      // the slice, not history
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
        .unionAll(li.select(col("pn").as("src"), col("sn").as("dst")))
      Graphs.integerPageRank(edges, "src", "dst", iters = 3)
    }),

    // Morton z-order layout key over (customer, order-day) — the
    // 2-d file-skipping sort key; branch-free codegen'd interleave
    // (see graft.ops.Layout / functions.ZOrderExpression; LayoutSpec
    // measures the file-skipping win over a 1-d sort).
    "q_zorder" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        graft.ops.Layout.zKey(
          col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long")).as("zkey"))),

    // Hilbert layout key over the same (customer, order-day) pair —
    // the better-locality sibling of q_zorder (consecutive keys are
    // always adjacent cells); 16 quadrant-rotation rounds inlined by
    // doGenCode, replicated round-for-round in the oracle's chained
    // CTEs (integer arithmetic only — bit-identical by construction).
    "q_hilbert" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        graft.ops.Layout.hilbertKey(
          col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long")).as("hkey"))),

    // 3-d Morton key over (customer, order-day, price-cents) — the
    // variadic interleave for tables clustered on more than two
    // columns; closed-form 48-term bit oracle.
    "q_zorder3" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        graft.ops.Layout.zKeyN(16)(
          col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("zkey3"))),

    // 3-d Hilbert key over the same triple — Skilling's transpose
    // transform (inverse-undo rounds, Gray encode, twist fold,
    // MSB-first interleave) replicated round-for-round in the
    // oracle's chained MATERIALIZED CTEs; integer-only, so the 48-bit
    // key is bit-identical by construction.
    "q_hilbert3" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        graft.ops.Layout.hilbertKeyN(16)(
          col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long"),
          (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("hkey3"))),

    // Deterministic 3-step walks from every supplier node over the
    // symmetrized supplier↔part graph — pseudo-random neighbor choice
    // by portable hash, no RNG (see Graphs.deterministicWalks).
    "q_walks" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
        .unionAll(li.select(col("pn").as("src"), col("sn").as("dst")))
      Graphs.deterministicWalks(edges, "src", "dst",
        li.select(col("sn")), "sn", steps = 3)
    }),

    // Per-node triangle counts + clustering coefficient over the
    // part co-purchase graph (parts sharing an order) — degree
    // orientation bounds wedge fan-out at O(√m) per node
    // (see Graphs.triangleCounts).
    "q_triangles" -> ((s, d) => {
      // collect_set dedups (order, part) in the same agg that builds
      // the per-order list — no separate distinct pre-shuffle
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = li.groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
        .select(explode(col("ps")).as("pa"), col("ps"))
        .select(col("pa"), explode(col("ps")).as("pb"))
        .filter(col("pa") < col("pb"))
      // 20k adjacency lists (~1.2M longs) at sf0.1 — comfortably
      // broadcastable, so the per-edge intersection closure runs
      // without shuffling the edge frame
      Graphs.triangleCounts(edges, "pa", "pb", broadcastAdjacency = true)
        .select(col("node").as("part_id"), col("degree"),
          col("n_triangles"), col("clustering"))
    }),

    // k-truss of the ≥2-co-occurrence part graph: edges surviving
    // two support-peel rounds (every edge in ≥ k−2 = 1 triangle,
    // recursively) — the edge-wise strengthening of q_kcore that
    // strips weakly-attached hubs a core keeps (see
    // graft.ops.Graphs.kTrussPeel; co-occurrence ≥ 2 prunes the
    // one-off pairings so the truss is of REPEATED relationships).
    "q_ktruss" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = li.groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
        .select(explode(col("ps")).as("pa"), col("ps"))
        .select(col("pa"), explode(col("ps")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2L)
      // the ≥2-co-occurrence EDGE LIST is a fraction of q_triangles'
      // already-broadcast one, so the same memory claim holds: the
      // whole edge list (oriented adjacency is edge-sized in
      // aggregate, NOT node-sized) must fit executor memory and
      // Spark's 8 GB broadcast cap — revisit this opt-in before any
      // data-scale change; each peel round's four joins then run
      // without shuffling the edge frame
      Graphs.kTrussPeel(edges, "pa", "pb", k = 3, rounds = 2,
        broadcastAdjacency = true)
    }),

    // The CERTIFIED k-truss: support-peel to the fixpoint (edge count
    // stable) instead of a pinned round budget — the variant whose
    // output is guaranteed truss membership. Shares q_ktruss's
    // unrolled oracle because once stable extra rounds are no-ops and
    // this graph converges in one round at every shipped SF
    // (measured; the general equivalence is spec-pinned).
    "q_ktruss_conv" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      val edges = li.groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
        .select(explode(col("ps")).as("pa"), col("ps"))
        .select(col("pa"), explode(col("ps")).as("pb"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2L)
      Graphs.kTrussConverged(edges, "pa", "pb", k = 3,
        broadcastAdjacency = true)
    }),

    // Fuzzy self-join: per-supplier count of names within Levenshtein
    // distance 1, via FastSS deletion-neighborhood blocking — an
    // equi-join on deletion variants + exact verify on candidates,
    // never an all-pairs product (see graft.ops.FuzzyJoin). Zero-padded
    // sequential names are a pathologically dense fuzzy workload
    // (every row has ~30 true neighbors), so the graded query runs on
    // the supplier dimension; the operator itself is column-agnostic.
    "q_fuzzy_join" -> ((s, d) =>
      FuzzyJoin.editDistance1Counts(
        Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        "s_suppkey", "s_name")
        .select(col("s_suppkey").as("supp_id"), col("n_fuzzy"))),

    // RANGE-frame window: per-customer trailing-30-day order sum —
    // the time-decayed feature shape (frames by VALUE distance, not
    // row count; peers with equal dates aggregate identically
    // regardless of tie order, so no float-rank hazard).
    "q_window_range" -> ((s, d) => {
      // o_orderdate is TIMESTAMP_NTZ: cast through session-TZ (UTC)
      // timestamp to epoch seconds — the same wall-clock seconds
      // DuckDB's epoch() yields
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400L, 0L)
      Tables.orders(s, d).select(
        col("o_custkey").as("cust_id"), col("o_orderkey").as("order_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_30d"),
        count(lit(1)).over(w).cast("long").as("n_30d"))
    }),

    // As-of (backward) join: each event picks up the latest order of
    // "its" customer at event time. Composed union+window operator —
    // one shuffle, no range explosion (see graft.ops.AsOf).
    "q_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"))
      AsOf.joinBackward(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate",
        payload = Seq("o_orderdate"))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("o_orderdate_asof"), "yyyy-MM-dd").as("last_order_date"))
    }),

    // Embedding near-duplicate pairs at cosine >= 0.45 via
    // hyperplane-LSH blocking (bucket equi-join + 1-bit multiprobe +
    // exact cosine verify) — the 100 TB shape; the oracle replicates
    // the bucket arithmetic exactly, and specs measure recall against
    // the exact-all-pairs ground truth.
    "q_dedup_embedding" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      Similarity.cosinePairsLsh(e, threshold = 0.45)
    }),

    // Semi join through a distributed bloom prefilter: the probe
    // (lineitem) is cut down by a broadcast bloom of the build keys
    // BEFORE the shuffle, exact semi join over survivors — result ≡
    // plain semi join (which is exactly what the oracle runs).
    "q_bloom_semi_join" -> ((s, d) =>
      BloomJoin.bloomSemiJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        Tables.part(s, d).filter(col("p_size") === 15).select(col("p_partkey")),
        "l_partkey", "p_partkey", expectedItems = 100000L)),

    // Salted fact×dim join: result ≡ plain inner join for ANY salt
    // assignment (each fact row matches exactly one dim replica), so
    // the plain join IS the oracle. The salt spreads a zipfian user
    // over saltBuckets tasks.
    "q_skew_join" -> ((s, d) =>
      Skew.saltedJoin(
        Tables.events(s, d).select(col("event_id"), col("user_id")),
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        "user_id", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"))),

    // §2.8 JSON surface: typed scalar extraction from a JSON column.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value"))),

    // Hierarchical aggregate (rollup) with decimal-exact sums.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))),

    // Distinct aggregation (two-phase partial at scale).
    "q_count_distinct" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))),

    // Three-way join: fact × dim × dim with decimal-exact revenue and
    // deterministic top-k (TPC-H Q3 flavor). Customer/orders broadcast
    // against lineitem at dim scale; shuffle join above broadcast
    // thresholds — Catalyst + AQE pick per-stats.
    "q_join3" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(20)
        .withColumnRenamed("l_orderkey", "order_id")
    }),

    // Anti join: customers with no orders above a threshold.
    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))
    }),

    // F1 evidence on testdata: two-level explode (doc → words →
    // char bigrams), re-aggregated.
    "q_explode_2level" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(expr("filter(split(text, ' '), w -> w != '')")).as("w"))
      words
        .select(explode(expr(
          "CASE WHEN length(w) >= 2 THEN " +
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) " +
          "ELSE array() END")).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // Running window aggregates: cumulative decimal-exact sum + lag.
    "q_window_running" -> ((s, d) => {
      val order = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey").as("cust_id"),
        col("o_orderkey").as("order_id"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(frame)
          .cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(order).as("prev_price"))
    }),

    // §2.8 string-function surface in one pass.
    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey").as("part_id"),
        upper(col("p_name")).as("upper_name"),
        length(trim(col("p_name"))).cast("long").as("trim_len"),
        lpad(col("p_partkey").cast("string"), 6, "0").as("padded_id"),
        translate(col("p_name"), "aeiou", "AEIOU").as("translated"),
        expr("replace(p_name, ' ', '_')").as("snake"),
        substring(col("p_name"), 1, 3).as("prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))),

    // §2.8 date/time surface; dayofweek normalized to Sunday=0 (both
    // engines), intervals/last-day emitted as date strings.
    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("order_id"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
        date_format(date_add(col("o_orderdate"), 90), "yyyy-MM-dd").as("plus90"),
        datediff(lit(java.sql.Date.valueOf("2025-01-01")), col("o_orderdate"))
          .cast("long").as("days_to_2025"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"))),

    // Pivot: per-user event counts spread into one column per type
    // (explicit value list keeps the schema static — required both
    // for Catalyst to plan a single pass and for the oracle).
    "q_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))),

    // Cube: all grouping-set combinations over two dims.
    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))),

    // Explicit GROUPING SETS (the general form cube/rollup sugar): two
    // one-dimension marginals + grand total, with grouping() flags to
    // disambiguate a NULL group value from a rolled-up row. SQL-first
    // entry point — the same text runs on the registered temp view.
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
          count(*) AS n_orders,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    }),

    // Two-pass equi-width histogram: exact bounds from one min/max
    // scan broadcast back, fixed-arithmetic binning (identical double
    // ops both engines), top bin right-closed.
    "q_histogram" -> ((s, d) => {
      val nb = 20
      val o = Tables.orders(s, d)
      val bounds = o.agg(
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(bounds))
        .select(least(
          floor((col("o_totalprice") - col("lo")) /
            ((col("hi") - col("lo")) / nb.toDouble)),
          lit((nb - 1).toDouble)).cast("long").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Equi-DEPTH histogram (optimizer-statistics companion to the
    // equi-width q_histogram): exact bucket bounds from the cumulative
    // distribution over DISTINCT values — the lengthPercentileBand
    // discipline — so no global sort of rows; ties (equal values)
    // always land in one bucket, so bucket populations are only
    // approximately n/B, exactly as real NDV-aware stats collectors
    // behave.
    "q_histogram_eqdepth" -> ((s, d) => {
      val nb = 8
      val docs = Tables.documents(s, d).select(col("n_chars").cast("long").as("v"))
      val dist = docs.groupBy("v").agg(count(lit(1)).as("cnt"))
      val cum = dist.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      val total = docs.agg(count(lit(1)).as("__n"))
      cum.crossJoin(broadcast(total))
        .withColumn("bucket", expr(s"((cum - cnt) * $nb) div __n"))
        .groupBy("bucket")
        .agg(min("v").as("lo"), max("v").as("hi"), sum("cnt").as("n_rows"))
    }),

    // Trailing-24-observation integer z-score anomaly scan over hourly
    // per-type event volumes (see graft.ops.Anomaly — the flag is
    // exact 64-bit arithmetic, no float mean/stddev).
    "q_anomaly" -> ((s, d) =>
      Anomaly.hourlyAnomalies(Tables.events(s, d), "event_type", "ts", 24, 3)),

    // Exact multi-point grouped quantiles (p25/p50/p75/p90) from the
    // distinct-value cumulative distribution — the q_median_disc
    // positional rule generalized: the quantile is the smallest value
    // whose cumulative count reaches q·n, tested in exact integer
    // arithmetic (cum·den ≥ num·n). The cumulative sum is two-phase so
    // parallelism is NOT bounded by group count (a
    // Window.partitionBy(g) would sort each group's whole distribution
    // in ONE task — the round-5 scale audit's one flagged shape):
    // deterministic equal-width value buckets within each group
    // (broadcast per-group min/max), local running sums per
    // (group, bucket), plus broadcast per-bucket offsets. Bucketing by
    // an order-preserving FUNCTION of the value — not
    // repartitionByRange, whose sampled boundaries may disagree
    // between the two uses of the frame if the exchange isn't reused —
    // keeps both phases consistent by construction, so the result is
    // deterministic under any partitioning.
    "q_quantiles_exact" -> ((s, d) =>
      graft.ops.Quantiles.cumDist(
        Tables.lineitem(s, d),
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
        .groupBy(col("g").as("l_returnflag"))
        .agg(
          min(when(col("cum") * 4 >= col("n"), col("v"))).as("p25_cents"),
          min(when(col("cum") * 2 >= col("n"), col("v"))).as("p50_cents"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("p75_cents"),
          min(when(col("cum") * 10 >= col("n") * 9, col("v"))).as("p90_cents"))),

    // Exact INTERPOLATED percentiles (PERCENTILE_CONT semantics) per
    // order status — the continuous twin of q_quantiles_exact: the
    // endpoints at sorted 0-based positions floor/ceil((n−1)·q) are
    // conditional-min rank reads on the same two-phase cumulative
    // distribution, and the fraction is EXACT integer arithmetic
    // ((n−1)·9 mod 10), so the single closing double expression is
    // bit-identical cross-engine.
    "q_percentile_cont" -> ((s, d) => {
      val cd = graft.ops.Quantiles.cumDist(
        Tables.orders(s, d),
        col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      // value at 0-based index i = min v with cum >= i+1
      def at(idx: Column): Column = min(when(col("cum") >= idx + 1L, col("v")))
      // `div` (not `/`): Spark's / on longs yields double
      val i50lo = expr("(n - 1) div 2")
      val i50hi = expr("n div 2")
      val i90lo = expr("((n - 1) * 9) div 10")
      val rem9 = pmod((col("n") - 1L) * 9L, lit(10L))
      val i90hi = i90lo + when(rem9 > 0L, 1L).otherwise(0L)
      def interp(lo: Column, hi: Column, fracNum: Column, fracDen: Double): Column =
        (lo.cast("double") +
          (hi.cast("double") - lo.cast("double")) *
            (fracNum.cast("double") / lit(fracDen))) / lit(100.0)
      cd.groupBy(col("g").as("o_orderstatus"))
        .agg(
          at(i50lo).as("v50lo"), at(i50hi).as("v50hi"),
          at(i90lo).as("v90lo"), at(i90hi).as("v90hi"),
          first(pmod(col("n") - 1L, lit(2L))).as("rem5"),
          first(rem9).as("rem9"))
        .select(col("o_orderstatus"),
          interp(col("v50lo"), col("v50hi"), col("rem5"), 2.0).as("p50_cont"),
          interp(col("v90lo"), col("v90hi"), col("rem9"), 10.0).as("p90_cont"))
    }),

    // UNPIVOT (inverse of q_pivot): wide per-flag metric columns
    // melted to (metric, value) rows via the stack generator —
    // shuffle-free on the already-aggregated frame, exact cent longs.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum((col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
            .as("qty_cents"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
            .as("price_cents"),
          count(lit(1)).as("n_items"))
        .select(col("l_returnflag"), expr(
          "stack(3, 'qty_cents', qty_cents, 'price_cents', price_cents, " +
            "'n_items', n_items) AS (metric, value)"))),

    // Set ops: intersect / except over key sets.
    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("cust_id"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("cust_id")))
    }),

    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("cust_id"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("cust_id")))
    }),

    // Multiset (bag) semantics: each duplicate participates
    // individually — intersectAll keeps min(countA, countB) copies,
    // exceptAll keeps countA − countB. Spark plans both as counted
    // aggregations + generate, never a row-pairing join.
    "q_intersect_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_returnflag") === "A").select(col("l_suppkey").as("supp_id"))
        .intersectAll(
          li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("supp_id")))
    }),

    "q_except_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_returnflag") === "A").select(col("l_suppkey").as("supp_id"))
        .exceptAll(
          li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("supp_id")))
    }),

    // Full outer join of two aggregated key sets — both unmatched
    // sides survive with coalesced zero counts (the join family's
    // last missing shape; left/semi/anti/inner are covered above).
    "q_join_full" -> ((s, d) => {
      val ev = Tables.events(s, d).groupBy(col("user_id").as("key_id"))
        .agg(count(lit(1)).as("n_events"))
      val ord = Tables.orders(s, d).groupBy(col("o_custkey").as("key_id"))
        .agg(count(lit(1)).as("n_orders"))
      ev.join(ord, Seq("key_id"), "full_outer")
        .select(col("key_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // The remaining rank-family windows in one pass: ntile buckets,
    // percent_rank / cume_dist (exact rational arithmetic on the same
    // longs both engines see), lead/lag over a UNIQUE ordering —
    // (o_totalprice, o_orderkey) — so neighbor reads are deterministic.
    "q_window_misc" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("tile4", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
        .select(col("o_orderstatus"), col("o_orderkey"), col("tile4"),
          col("pct_rank"), col("cume"), col("next_key"), col("prev_key"))
    }),

    // KMV distinct-count sketch (graft.functions.KmvSketch): a
    // mergeable bounded-memory Aggregator whose estimate is
    // DETERMINISTIC under the portable hash — so unlike HLL it is
    // fully oracle-verified (the SQL twin recomputes the k smallest
    // distinct hashes and the same estimator).
    // Distributed closed-form OLS per return flag: a model fit as ONE
    // aggregation pass (five exact integer sufficient statistics +
    // constant-time solve — see graft.ops.Regression).
    "q_ols_fit" -> ((s, d) =>
      graft.ops.Regression.olsFit(Tables.lineitem(s, d),
        yCol = "l_extendedprice", xCol = "l_quantity",
        groupCols = Seq("l_returnflag"))),

    // Deterministic hash-reservoir quantile estimates — the third
    // fully-hash-verified sketch family (KMV discipline applied to
    // value sampling): per-group sample = values of the 64 smallest-
    // hash order keys, quantiles are positional reads on it. Where
    // q_approx_quantiles (KLL) is rows-only checkable, these
    // estimates hash-match the oracle bit-for-bit.
    "q_quantile_reservoir" -> ((s, d) => {
      val res = graft.functions.ReservoirSketch.reservoir(64)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(res(col("o_orderkey"), col("o_totalprice")).as("vs"))
        .select(
          col("o_orderpriority"),
          size(col("vs")).cast("long").as("m"),
          element_at(col("vs"),
            (floor(lit(0.5) * (size(col("vs")) - 1)) + 1).cast("int")).as("p50_est"),
          element_at(col("vs"),
            (floor(lit(0.9) * (size(col("vs")) - 1)) + 1).cast("int")).as("p90_est"))
    }),

    "q_kmv_distinct" -> ((s, d) => {
      val kmv = graft.functions.KmvSketch.kmvDistinct(64)
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(kmv(col("user_id")).as("kmv_estimate"),
          countDistinct(col("user_id")).as("exact_distinct"))
    }),

    // Custom HLL whose registers AND integer fixed-point estimate are
    // replicated in the oracle — the hash-verified twin of the
    // rows-only q_approx_distinct (see graft.functions.HllSketch).
    "q_hll_custom" -> ((s, d) => {
      val hll = graft.functions.HllSketch.hllFp20()
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(hll(col("user_id")).as("hll_fp20"),
          countDistinct(col("user_id")).as("exact_distinct"))
        .withColumn("hll_est", expr("hll_fp20 div 1048576"))
    }),

    // Sketch MERGE — the property that makes sketches matter at
    // 100 TB (sketch per shard/day, combine without re-scan): the
    // per-group k-minimum-value sketches union to the exact global
    // sketch (any global k-minimum is one of its group's k minima), so
    // the merged estimate is deterministic and fully oracle-verified
    // against the from-scratch global sketch.
    "q_kmv_merge" -> ((s, d) => {
      val K = 64
      val kmvh = graft.functions.KmvSketch.kmvHashes(K)
      val perGroup = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(kmvh(col("user_id")).as("sketch"))
      val merged = perGroup.agg(
        count(lit(1)).as("n_groups"),
        slice(array_sort(array_distinct(flatten(collect_list(col("sketch"))))),
          1, K).as("mh"))
      val exact = Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      merged.crossJoin(exact).select(
        col("n_groups"),
        when(size(col("mh")) < K, size(col("mh")).cast("double"))
          .otherwise(lit((K - 1).toDouble) *
            lit(graft.functions.KmvSketch.P.toDouble) /
            element_at(col("mh"), K).cast("double")).as("kmv_estimate"),
        col("exact_distinct"))
    }),

    // KMV set-operation estimates between group sketches (Beyer et
    // al. 2007): union sketch = k smallest of the two sketches'
    // union; Jaccard = |A∩B∩U|/|U|; intersection size = J·union_est.
    // At 100 TB the pair fan-out is |groups|²/2 over k-bounded sketch
    // rows — never over data — so comparing every pair of shards/days
    // is driver-cheap after one corpus scan.
    "q_kmv_intersect" -> ((s, d) => {
      val K = 64
      val P = graft.functions.KmvSketch.P
      val kmvh = graft.functions.KmvSketch.kmvHashes(K)
      val per = Tables.events(s, d)
        .groupBy(col("event_type")).agg(kmvh(col("user_id")).as("sk"))
      per.select(col("event_type").as("group_a"), col("sk").as("ska"))
        .crossJoin(broadcast(
          per.select(col("event_type").as("group_b"), col("sk").as("skb"))))
        .filter(col("group_a") < col("group_b"))
        .withColumn("mh",
          slice(array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, K))
        .withColumn("usize", size(col("mh")).cast("long"))
        .withColumn("shared_k",
          size(array_intersect(array_intersect(col("ska"), col("skb")), col("mh")))
            .cast("long"))
        .withColumn("union_est",
          when(col("usize") < K, col("usize").cast("double"))
            .otherwise(lit((K - 1).toDouble * P.toDouble) /
              element_at(col("mh"), K).cast("double")))
        .withColumn("jaccard_est",
          col("shared_k").cast("double") / col("usize").cast("double"))
        .withColumn("intersect_est",
          col("union_est") * col("shared_k").cast("double") /
            col("usize").cast("double"))
        .select(col("group_a"), col("group_b"), col("shared_k"), col("usize"),
          col("union_est"), col("jaccard_est"), col("intersect_est"))
    }),

    // Approximate aggregates (sketches): HLL distinct count and KLL
    // quantiles. Sketch internals differ across engines, so the raw
    // estimates can't hash-match a DuckDB oracle — instead each query
    // emits its exact twin's values PLUS a boolean certifying the
    // estimate sits inside the sketch's published error bound, and the
    // oracle computes the exact values with literal TRUE. A hash match
    // is then an honest ε-bound check (any out-of-bound estimate flips
    // the boolean and fails the hash), not a vacuous constant: the
    // estimate still participates, only through the bound.
    // HLL++ default rsd = 0.05; certify |approx − exact| ≤ 3·rsd·exact.
    // AMS F2 sketch priced against the exact second frequency moment
    // (self-join-size / skew estimation without a second scan): 32
    // exact ±1-signed integer counters over the per-key count frame,
    // estimate = median of their squares, exact anchor from the SAME
    // frame — both hash-verified.
    "q_f2_sketch" -> ((s, d) =>
      Moments.amsF2(Tables.events(s, d), col("user_id"))),

    "q_approx_distinct" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_users"), col("n_events"),
          (abs(col("approx") - col("n_users")).cast("double") <=
            col("n_users").cast("double") * 0.15).as("within_3rsd"))),

    // percentile_approx(accuracy=1000) guarantees rank error ≤
    // n/accuracy; certify the estimate lies between the values at
    // ranks target ∓ (n div accuracy + 1) (the +1 absorbs the
    // fractional-rank discretization). Exact positional p50/p90 ride
    // along hash-anchored, same rank conventions as q_median_disc.
    "q_approx_quantiles" -> ((s, d) => {
      val acc = 1000
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
      val wc = Window.partitionBy(col("o_orderstatus"))
      def at(rank: String) =
        max(when(col("rn") === expr(rank), col("o_totalprice")))
      val slack = s"(cnt div $acc + 1)"
      val t50 = "(cnt + 1) div 2"
      val t90 = "cast(ceil(0.9 * cnt) as bigint)"
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(acc)).as("a50"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(acc)).as("a90"),
          at(t50).as("p50_exact"),
          at(t90).as("p90_exact"),
          at(s"greatest(1, $t50 - $slack)").as("lo50"),
          at(s"least(cnt, $t50 + $slack)").as("hi50"),
          at(s"greatest(1, $t90 - $slack)").as("lo90"),
          at(s"least(cnt, $t90 + $slack)").as("hi90"))
        .select(col("o_orderstatus"), col("p50_exact"), col("p90_exact"),
          (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
            .as("p50_in_bounds"),
          (col("a90") >= col("lo90") && col("a90") <= col("hi90"))
            .as("p90_in_bounds"))
    }),

    // Exact positional (discrete) median per group — value at row
    // ceil(n/2) of the sorted partition; engine-portable, unlike
    // interpolated percentiles.
    "q_median_disc" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val wc = Window.partitionBy(col("l_returnflag"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("l_returnflag"), col("l_extendedprice").as("median_price"))
    }),

    // Multi-source BFS hop layers (3 hops) over the symmetrized
    // supplier↔part graph, seeded at every 10th supplier — frontier
    // expansion with per-round checkpoints, O(m) total join work
    // (see graft.ops.Graphs.bfsLayers).
    "q_bfs" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
        .unionAll(li.select(col("pn").as("src"), col("sn").as("dst")))
      val seeds = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .filter(col("l_suppkey") % 10L === 0L)
        .select((col("l_suppkey") * 2L + 1L).as("sn"))
      Graphs.bfsLayers(edges, "src", "dst", seeds, "sn", maxHops = 3)
    }),

    // Hourly gap-fill + forward fill per user — the dense-series
    // regularization (distributed spine via sequence+explode, no
    // driver calendar, no global cross join; see
    // graft.ops.Timeseries.gapFillHourly).
    "q_gapfill" -> ((s, d) =>
      Timeseries.gapFillHourly(
        Tables.events(s, d).filter(col("user_id") < 40L),
        "user_id", "ts", "value")
        .withColumnRenamed("entity", "user_id")),

    // Dense global row numbers over documents — distributed
    // zipWithIndex (range partition + local rank + broadcast prefix
    // offsets), replacing the single-task ORDER-BY window (see
    // graft.ops.Prefix.globalRowNumbers).
    "q_global_ids" -> ((s, d) =>
      Prefix.globalRowNumbers(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id")),

    // 2-d skyline (Pareto frontier) of orders on (totalprice,
    // orderdate): the quadratic NOT-EXISTS collapsed to a
    // distributed strict prefix-max (see graft.ops.Prefix.skylineMax2d).
    "q_skyline" -> ((s, d) =>
      Prefix.skylineMax2d(
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
        "o_totalprice", "o_orderdate")),

    // Synchronous label propagation (3 rounds, mode-with-min-tie-break
    // as an exact packed-long argmax) over the supplier↔part graph —
    // deterministic community detection (see
    // graft.ops.Graphs.labelPropagation).
    "q_label_prop" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
        .unionAll(li.select(col("pn").as("src"), col("sn").as("dst")))
      Graphs.labelPropagation(edges, "src", "dst", iters = 3)
    }),

    // Poisson bootstrap: 32 deterministic resample means of the order
    // total in ONE pass — integer inverse-CDF multiplicities, exact
    // cent sums, map-side combine collapses the ×32 explosion before
    // the shuffle (see graft.ops.Bootstrap).
    "q_bootstrap" -> ((s, d) =>
      graft.ops.Bootstrap.poissonBootstrapMeans(
        Tables.orders(s, d), "o_orderkey", "o_totalprice", resamples = 32)),

    // SCD Type 1 changelog compaction: latest event per user as ONE
    // struct-argmax hash agg — no window, no sort, map-side combine
    // (see graft.ops.Scd.latestSnapshot).
    "q_upsert_latest" -> ((s, d) =>
      Scd.latestSnapshot(Tables.events(s, d), "user_id", "ts", "event_id",
        Seq("event_type", "value"))),

    // Quantity-WEIGHTED exact median/p90 of the price per return flag
    // — the weighted reading of the same two-phase cumulative
    // distribution (see graft.ops.Quantiles.cumDist weightExpr).
    "q_weighted_median" -> ((s, d) =>
      graft.ops.Quantiles.cumDist(
        Tables.lineitem(s, d),
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
        .groupBy(col("g").as("l_returnflag"))
        .agg(
          min(when(col("cum") * 2 >= col("n"), col("v"))).as("wmedian_cents"),
          min(when(col("cum") * 10 >= col("n") * 9, col("v"))).as("wp90_cents"))),

    // Per-group z-score standardization of two measures — exact
    // decimal sufficient statistics broadcast back, scaling as a
    // shuffle-free projection (see graft.ops.Features.zscore).
    "q_zscore" -> ((s, d) =>
      graft.ops.Features.zscore(
        Tables.lineitem(s, d), "l_returnflag",
        Seq("l_quantity", "l_extendedprice"),
        Seq("l_orderkey", "l_linenumber"))),

    // EXACT-count stratified sample: precisely floor(3/10 · n_lang)
    // docs per language — per-stratum rank thresholds read from the
    // shared two-phase cumdist, keep test as a shuffle-free filter
    // (see graft.ops.Sampling.exactQuotaSample).
    "q_exact_quota" -> ((s, d) =>
      graft.ops.Sampling.exactQuotaSample(
        Tables.documents(s, d).select(col("lang"), col("doc_id"), col("n_chars")),
        "lang", "doc_id", num = 3, den = 10)),

    // 3-round 2-core peel of the supplier↔part graph — iterative
    // low-degree stripping with per-round checkpoints (see
    // graft.ops.Graphs.kCorePeel).
    "q_kcore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      Graphs.kCorePeel(li, "sn", "pn", k = 2, rounds = 3)
    }),

    // The certified 2-core (fixpoint peel, q_ktruss_conv's contract):
    // converges in one round on this graph at every shipped SF, so it
    // shares q_kcore's 3-round unrolled oracle.
    "q_kcore_conv" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp_ntz"))
        .select((col("l_suppkey") * 2L + 1L).as("sn"), (col("l_partkey") * 2L).as("pn"))
      Graphs.kCoreConverged(li, "sn", "pn", k = 2)
    }),

    // Deterministic balanced sharding: running byte total over the
    // doc_id order (range-partitioned prefix sum, no single-task
    // window) → shard = (cum−1) div target — equal-size output
    // shards whose boundaries respect the global order (see
    // graft.ops.Prefix.runningTotal).
    "q_shard_assign" -> ((s, d) =>
      Prefix.runningTotal(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars")
        .withColumn("shard", expr("(cum - 1) div 100000"))),

    // Winsorize the price to its per-flag exact [p05, p95] band —
    // cumdist rank thresholds broadcast back, integer clip projection
    // (see graft.ops.Features.winsorize).
    "q_winsorize" -> ((s, d) =>
      graft.ops.Features.winsorize(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"))),

    // Robust (median/MAD) z-score of the price per flag — two cumdist
    // passes, one closing double expression (see
    // graft.ops.Features.robustZ).
    "q_robust_z" -> ((s, d) =>
      graft.ops.Features.robustZ(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"))),

    // The SQL-first twin of q_global_ids: a user-written global
    // row_number() window, rewritten to the range-partitioned prefix
    // scan by the PrefixScanRewrite optimizer rule (injected via
    // GraftExtensions/GraftSession) — same numbering, no single-task
    // sort, proven through the same oracle gate.
    "q_rownum_sql" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        .createOrReplaceTempView("graft_rownum_docs")
      s.sql("""SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY doc_id) AS gid
               FROM graft_rownum_docs""")
    }),

    // Data-quality contract report over the star schema: PK
    // uniqueness, FK integrity (counted anti-join), null rate, value
    // range, domain membership — one uniform report row per check
    // (see graft.ops.Checks).
    "q_dq_checks" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      graft.ops.Checks.reportAll(Seq(
        graft.ops.Checks.unique(o, "orders_pk_unique", Seq("o_orderkey")),
        graft.ops.Checks.unique(li, "lineitem_pk_unique",
          Seq("l_orderkey", "l_linenumber")),
        graft.ops.Checks.refIntegrity(li, "lineitem_fk_orders",
          "l_orderkey", o, "o_orderkey"),
        graft.ops.Checks.nonNull(o, "orders_custkey_nonnull", "o_custkey"),
        graft.ops.Checks.inRange(li, "lineitem_qty_range",
          "l_quantity", 1.0, 50.0),
        graft.ops.Checks.inDomain(o, "orders_status_domain",
          "o_orderstatus", Seq("O", "F", "P"))))
    }),

    // Incremental view maintenance: per-user (count, exact sum)
    // partials maintained across a history/batch split, merged
    // WITHOUT rescanning history; the oracle recomputes from the
    // full union, proving merge(partials(A), partials(B)) ≡
    // partials(A ∪ B) (see graft.ops.Incremental).
    "q_incr_agg" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = lit("2024-01-20").cast("timestamp")
      val stored = graft.ops.Incremental.partials(
        ev.filter(col("ts") < cutoff), "user_id", "value")
      val batch = graft.ops.Incremental.partials(
        ev.filter(col("ts") >= cutoff), "user_id", "value")
      graft.ops.Incremental.withMean(
        graft.ops.Incremental.merge(stored, batch, "user_id"))
    }),

    // CDC apply (MERGE INTO): fold an upsert/delete changelog into
    // the pre-cutoff snapshot as ONE order-free struct-argmax agg —
    // no window, no join, no ordered replay (see
    // graft.ops.Scd.applyChangeLog).
    "q_cdc_apply" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = lit("2024-01-20").cast("timestamp")
      val base = Scd.latestSnapshot(
        ev.filter(col("ts") < cutoff), "user_id", "ts", "event_id",
        Seq("event_type", "value"))
        .select(col("user_id"), col("last_ts").as("ts"),
          col("last_event_id").as("event_id"),
          col("last_event_type").as("event_type"),
          col("last_value").as("value"))
      val changes = ev.filter(col("ts") >= cutoff)
        .withColumn("op",
          when(col("event_id") % 10L === 0L, "D").otherwise("U"))
      Scd.applyChangeLog(base, changes, "user_id", "ts", "event_id", "op",
        Seq("event_type", "value"))
    }),

    // Global NTILE(7) with no single-task window — pure arithmetic on
    // the distributed row numbers + a 1-row total broadcast, matched
    // bit-for-bit against native NTILE (see graft.ops.Prefix.globalNtile).
    "q_ntile_global" -> ((s, d) =>
      Prefix.globalNtile(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
        "o_orderkey", n = 7)),

    // Median-of-means: the heavy-tail-robust mean estimator (split
    // into k=16 deterministic hash buckets, exact per-bucket means,
    // median of the bucket means) — one pass + a k-element positional
    // read; the estimator large-scale eval uses when a single
    // corrupted shard must not move the answer. Bucketing by the
    // portable sampling hash, so the estimate is partition- and
    // engine-stable.
    "q_median_means" -> ((s, d) => {
      val k = 16
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val h = graft.ops.Sampling.sampleHash(col("o_orderkey"), salt = 0L)
      Tables.orders(s, d)
        .select(col("o_orderstatus").as("g"), pmod(h, lit(k.toLong)).as("b"),
          cents.as("v"))
        .groupBy("g", "b")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .select(col("g"), col("b"),
          (col("sv").cast("double") / col("n").cast("double") / lit(100.0))
            .as("m"))
        .groupBy(col("g").as("o_orderstatus"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(col("o_orderstatus"),
          expr("element_at(ms, cast((size(ms) + 1) div 2 as int))")
            .as("median_of_means"),
          size(col("ms")).cast("long").as("n_buckets"))
    }),

    // MapType round-trip surface: per-user event-type count map built
    // with map_from_entries, pruned with map_filter, rescaled with
    // transform_values, extended with map_concat, then exploded back
    // to hash-safe (k, v) rows. All four lambdas are Catalyst
    // higher-order functions — codegen-friendly, no UDFs.
    "q_map_funcs" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val m = counts.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
          .as("m"))
      m.select(col("user_id"),
        explode(map_concat(
          transform_values(
            map_filter(col("m"), (_, v) => v >= 3L),
            (_, v) => v * 2L),
          map(lit("_n_types"), size(col("m")).cast("long")))).as(Seq("k", "v")))
    }),

    // OHLC bar resampling per (event_type, hour): deterministic
    // open/close via the struct-min trick — ONE order-free hash
    // aggregation whose partials carry bars, not events (see
    // graft.ops.Timeseries.resampleOhlc).
    "q_resample_ohlc" -> ((s, d) =>
      Timeseries.resampleOhlc(Tables.events(s, d),
        "event_type", "ts", "event_id", "value")
        .withColumnRenamed("entity", "event_type")),

    // Per-row lag deltas over each user's series in exact cents —
    // per-entity partitioned window, no global sort.
    "q_lag_delta" -> ((s, d) =>
      Timeseries.lagDeltas(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")),

    // Lag-1 autocorrelation per event type from exact integer
    // sufficient statistics (the q_ols_fit discipline applied to
    // consecutive-observation pairs).
    "q_autocorr" -> ((s, d) =>
      Timeseries.autocorrLag1(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id", "value")
        .withColumnRenamed("g", "event_type")),

    // Exponential smoothing as an exact 8-tap FIR filter: power-of-
    // two weights on fixed-point cents, one double division at the
    // end (see graft.ops.Timeseries.ewmaFir for why the truncated
    // form is both the exact and the scale-safe one).
    "q_ewma" -> ((s, d) =>
      Timeseries.ewmaFir(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")),

    // Skewness/excess kurtosis per group from exact integer power
    // sums — Spark's own skewness/kurtosis stream partition-order-
    // dependent co-moments and can't hash-verify (see
    // graft.ops.Moments).
    "q_moments" -> ((s, d) =>
      Moments.momentsByGroup(Tables.lineitem(s, d),
        "l_returnflag", "l_quantity")
        .withColumnRenamed("g", "l_returnflag")),

    // Welch's unequal-variance t-test between return flags A and N:
    // ONE conditional-sum aggregation over the filtered scan,
    // closed-form t and Welch-Satterthwaite df on the merged row.
    "q_welch_ttest" -> ((s, d) =>
      Moments.welchTTest(Tables.lineitem(s, d),
        "l_returnflag", "A", "N", "l_extendedprice")),

    // Spearman rank correlation with exact tie-averaged ranks:
    // doubled ranks (2*cum - cnt + 1) stay integral, computed from
    // the scale-safe cumDist frame — parallelism never collapses to
    // group count.
    "q_spearman" -> ((s, d) =>
      Moments.spearmanByGroup(Tables.lineitem(s, d), "l_returnflag",
        col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
        .withColumnRenamed("g", "l_returnflag")),

    // Ordered group concatenation (LISTAGG/STRING_AGG parity): the
    // sort inside array_sort makes the result order-deterministic;
    // buffer bounded by nations-per-region (use the TopKRows
    // aggregator instead when group sizes are unbounded).
    "q_string_agg" -> ((s, d) =>
      Tables.nation(s, d).join(Tables.region(s, d),
        col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"))),

    // Daily burst detection per event type: Poisson-style z of each
    // day's count against the trailing 7-observed-day baseline —
    // integer excess (7·cnt − Σwin) with one closing z expression.
    // Windows partition by type, so parallelism is type-count, and
    // the frame is the calendar-bounded daily summary.
    "q_burst" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy("dn")
        .rowsBetween(-7, -1)
      Tables.events(s, d)
        .select(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("dn"))
        .groupBy("event_type", "dn").agg(count(lit(1)).as("cnt"))
        .withColumn("cw", count(lit(1)).over(w))
        .withColumn("sumw",
          when(col("cw") === 7, sum(col("cnt")).over(w)))
        .withColumn("d7", lit(7L) * col("cnt") - col("sumw"))
        .select(col("event_type"), col("dn").cast("long").as("day_n"),
          col("cnt"), expr(BurstZExpr).as("z"),
          expr(s"CASE WHEN ($BurstZExpr) > 3.0 THEN 1 ELSE 0 END")
            .cast("long").as("burst"))
    }),

    // Reliability/calibration table: value-band bins vs purchase
    // rate — exact integer sums per bin, closing rate/mean divisions.
    "q_calibration" -> ((s, d) =>
      Tables.events(s, d)
        .select(least(floor(col("value") / 50), lit(9)).cast("long")
          .as("bin"),
          (col("event_type") === "purchase").cast("long").as("y"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
          sum("cents").as("sc"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("CAST(n_pos AS DOUBLE)/CAST(n AS DOUBLE)").as("pos_rate"),
          expr("CAST(sc AS DOUBLE)/CAST(n AS DOUBLE)/100.0")
            .as("mean_value"))),

    // Correlated LATERAL subquery (top-2 orders per customer):
    // Catalyst decorrelates the ORDER BY/LIMIT lateral into a ranked
    // join — the SQL-surface twin of q_group_topk's aggregator path.
    "q_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("graft_lat_customer")
      Tables.orders(s, d).createOrReplaceTempView("graft_lat_orders")
      s.sql("""
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM graft_lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM graft_lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""")
    }),

    // HITS hubs/authorities on the user->event_type bipartite graph:
    // two exact integer power-iteration rounds (unnormalized — the
    // partition-order-invariant form), closing share normalization.
    "q_hits" -> ((s, d) =>
      Graphs.hits(Tables.events(s, d), "user_id", "event_type")),

    // l-diversity audit over the k-anonymity quasi-identifier
    // buckets: distinct sensitive values (lang) per equivalence
    // class, at-risk below l=3. One aggregation with a distinct
    // expansion — the release-gate counterpart of q_k_anonymity.
    "q_l_diversity" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), expr("n_chars div 1000").as("len_kb"),
          col("lang"))
        .groupBy(col("source"), col("len_kb"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("lang")).as("l_div"))
        .withColumn("at_risk", (col("l_div") < 3L).cast("long"))),

    // Pointwise mutual-information decomposition of the
    // (returnflag, linestatus) contingency: per-cell MI contribution
    // from exact counts — margins ride partitioned windows on the
    // 6-cell frame, the grand total a global window on the same rows
    // (no second scan). Summing the parts gives I(X;Y); emitting
    // per-cell keeps every double a closed form of integers.
    "q_mutual_info" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_xy"))
        .withColumn("nx",
          sum(col("n_xy")).over(Window.partitionBy(col("l_returnflag"))))
        .withColumn("ny",
          sum(col("n_xy")).over(Window.partitionBy(col("l_linestatus"))))
        .withColumn("n", sum(col("n_xy")).over(Window.partitionBy()))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_xy"),
          expr(MiPartExpr).as("mi_part"))),

    // Additive seasonal decomposition of the hourly event series:
    // centered 24h moving-average trend, hour-of-day seasonal means
    // from the INTEGER detrended series (24·cnt − Σwin), remainder.
    // All windows ride the calendar-bounded hourly summary frame.
    "q_seasonal" -> ((s, d) =>
      SeriesOps.seasonalDecompose(Tables.events(s, d), "ts")),

    // Lagged cross-correlation between purchase and click daily
    // counts at lags 0..7: integer day-number equi-joins over the
    // daily summary frame, exact Pearson sufficient sums per lag.
    "q_cross_corr" -> ((s, d) =>
      SeriesOps.crossCorrelation(Tables.events(s, d), "event_type",
        "ts", "purchase", "click", maxLag = 7)),

    // Exact trailing-7-day distinct active users per day: per-user
    // interval merge → ±1 boundary deltas → distributed running
    // total (Prefix machinery). No day×user fan-out, no per-day
    // distinct pass — the 100 TB WAU shape.
    "q_sliding_distinct" -> ((s, d) =>
      SeriesOps.slidingDistinctActives(Tables.events(s, d),
        "user_id", "ts", windowDays = 7)),

    // Mann-Whitney rank-sum between return flags on quantity: exact
    // doubled average ranks over the cumDist distinct-value frame,
    // tie-corrected z, AUC as the probability-of-superiority reading.
    "q_mann_whitney" -> ((s, d) =>
      StatTests.mannWhitney(Tables.lineitem(s, d), "l_returnflag",
        "A", "N", col("l_quantity").cast("long"))),

    // The same U machinery read as exact tie-adjusted ROC-AUC: how
    // well does event value (cents) separate purchases from clicks.
    "q_auc" -> ((s, d) =>
      StatTests.mannWhitney(Tables.events(s, d), "event_type",
        "purchase", "click", floor(col("value") * 100).cast("long"))),

    // Two-sample Kolmogorov-Smirnov D between return flags on price
    // cents: both CDFs ride one bucketed two-phase prefix pass; the
    // max |F_a - F_b| numerator stays integral.
    "q_ks_test" -> ((s, d) =>
      StatTests.ksTest(Tables.lineitem(s, d), "l_returnflag",
        "A", "N", floor(col("l_extendedprice") * 100).cast("long"))),

    // Kendall tau-b on the (quantity, linenumber) contingency table:
    // concordant/discordant totals from cell-pair products (50x7
    // cells), never input pairs.
    "q_kendall" -> ((s, d) =>
      StatTests.kendallTauB(Tables.lineitem(s, d),
        col("l_quantity").cast("long"), col("l_linenumber").cast("long"))),

    // Gini concentration of price cents per return flag from the
    // cumDist frame: tie-adjusted doubled-rank fold, no global sort.
    "q_gini" -> ((s, d) =>
      StatTests.giniByGroup(Tables.lineitem(s, d), "l_returnflag",
        floor(col("l_extendedprice") * 100).cast("long"))
        .withColumnRenamed("g", "l_returnflag")),

    // Benford first-digit profile of order totals with per-digit
    // chi-square contributions — string arithmetic on the floored
    // integer, no log-of-double digit extraction.
    "q_benford" -> ((s, d) =>
      StatTests.benfordProfile(Tables.orders(s, d), col("o_totalprice"))),

    // Resource-allocation node similarity (the exactly-computable
    // Adamic-Adar cousin) over the user->event_type bipartite graph:
    // grouped posting-list pair generation, fixed-point 1/deg
    // weights (see graft.ops.Graphs.resourceAllocation).
    "q_node_sim" -> ((s, d) =>
      Graphs.resourceAllocation(Tables.events(s, d),
        "user_id", "event_type")),

    // Uncorrelated scalar subqueries: orders above the GLOBAL mean
    // price, counted per priority. Catalyst plans each aggregate
    // subquery as a one-row broadcast; the comparison is kept exact
    // in integers (cents * n > total_cents avoids a float mean).
    "q_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_ssq_orders")
      s.sql("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above
        FROM graft_ssq_orders
        WHERE CAST(floor(o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM graft_ssq_orders) >
              (SELECT sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               FROM graft_ssq_orders)
        GROUP BY o_orderpriority""")
    }),

    // First-order Markov transition matrix of event types per user
    // stream: one per-entity window, then hash aggregation; the
    // probability normalization runs over the |states|^2 aggregated
    // frame, never over events. p_ppm is exact integer floor division.
    "q_transitions" -> ((s, d) =>
      Sequences.transitionCounts(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type")),

    // First/last-touch attribution: each purchase bound to the
    // earliest and most recent strictly-preceding click of the same
    // user via conditional struct min/max over ONE window pass — no
    // join back to the touch stream.
    "q_attribution" -> ((s, d) =>
      Sequences.touchAttribution(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", "click", "purchase")),

    // CUSUM change-point scan per user in exact integers
    // (C_k = n*P_k - k*S; argmax |C_k| via struct max — see
    // graft.ops.Anomaly.cusumChangePoint).
    "q_cusum" -> ((s, d) =>
      Anomaly.cusumChangePoint(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")
        .withColumnRenamed("entity", "user_id")),

    // Two-regressor OLS in closed form: nine exact sufficient sums,
    // Cramer's-rule solve — the multivariate fit is still ONE
    // aggregation pass (see graft.ops.Regression.olsFit2; the
    // determinant texts are shared verbatim with this oracle).
    "q_ols2" -> ((s, d) =>
      graft.ops.Regression.olsFit2(Tables.lineitem(s, d),
        yCol = "l_extendedprice", x1Col = "l_quantity",
        x2Col = "l_discount", groupCols = Seq("l_returnflag"))),

    // Degree assortativity of the part-supplier bipartite graph:
    // Newman's mixing coefficient from exact decimal degree-product
    // sums (see graft.ops.Graphs.degreeAssortativity).
    "q_assortativity" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        (col("l_partkey") * 2L).as("pn"),
        (col("l_suppkey") * 2L + 1L).as("sn"))
      Graphs.degreeAssortativity(li, "pn", "sn")
    }),

    // One-day-half-life decayed engagement per user: dyadic 2^(h-age)
    // weights keep the recency fold an exact integer sum — no exp()
    // (see graft.ops.Sequences.decayedEngagement).
    "q_decayed" -> ((s, d) =>
      Sequences.decayedEngagement(Tables.events(s, d),
        "user_id", "ts", asofDate = "2024-02-01")
        .withColumnRenamed("entity", "user_id")),

    // Entity resolution as a composition of existing operators:
    // deletion-neighborhood blocking + edit-distance-1 match
    // (FuzzyJoin) -> transitive closure (Clusters min-label
    // propagation) -> canonical entity id per record. The record-
    // linkage pipeline (match -> cluster -> canonicalize) with no new
    // machinery — every stage is the already-plan-gated operator.
    "q_entity_resolution" -> ((s, d) => {
      val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
      graft.ops.Clusters.dedupClusters(sup, "s_suppkey",
        FuzzyJoin.editDistance1Pairs(sup, "s_suppkey", "s_name"),
        "id_a", "id_b")
    }),

    // Deterministic epoch shuffle: dense 1..N training order from a
    // seedless affine hash of the doc id, ranked by the scale-safe
    // distributed zipWithIndex (range partition + local rank +
    // broadcast offsets — never a single-task global sort). The
    // id-modulo tie-break rides inside one composite long key.
    "q_shuffle_order" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("_sk", expr(ShuffleKeySql))
      Prefix.globalRowNumbers(docs, "_sk")
        .select(col("doc_id"), col("gid").as("shuffle_rank"))
    }),

    // URL canonicalization over a deterministically-dirtied synthetic
    // URL (the corpus has no url column — the q_web_domains /
    // q_pii_scrub injection discipline): case, default port, tracking
    // params, fragments, trailing slash all normalized in a pure
    // per-row projection (see graft.ops.Web.canonicalizeUrl).
    "q_url_canon" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), expr(DirtyUrlSql).as("url"))
        .withColumn("canon_url", graft.ops.Web.canonicalizeUrl(col("url")))),

    // k-anonymity risk report over quasi-identifier buckets (lang,
    // source, length band): equivalence-class sizes plus the at-risk
    // flag (n < k) — the privacy audit a corpus release runs before
    // publishing per-group statistics. ONE partial-combining hash
    // aggregation; the quasi-identifier bucketing is a per-row
    // integer projection.
    "q_k_anonymity" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("source"),
          expr("n_chars div 1000").as("len_kb"))
        .groupBy(col("lang"), col("source"), col("len_kb"))
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", (col("n") < 5L).cast("long"))),

    // URL-keyed dedup end to end: canonicalize (the COLLIDING dirty
    // injection — distinct raw URLs, shared canonical forms), then
    // first-occurrence election per canonical URL — what crawl dedup
    // actually keys on. ONE hash aggregation after a per-row
    // projection.
    "q_url_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.Web.canonicalizeUrl(expr(CollidingUrlSql)).as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))),

    // Top user journeys: most common 3-step opening paths — the
    // order-sensitive path mining pairwise transitions can't answer
    // (see graft.ops.Sequences.topPaths).
    "q_event_paths" -> ((s, d) =>
      Sequences.topPaths(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type")),

    // Sliding-frame value windows: first/nth/last over a ROWS frame
    // with a unique (price, key) ordering — the remaining
    // window-function family q_window_misc's rank pack doesn't cover.
    "q_window_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_orderstatus"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_in_frame"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_in_frame"),
        last(col("o_orderkey")).over(w).as("last_in_frame"))
    }),

    // CORRELATED scalar subqueries (per-group mean in the WHERE):
    // Catalyst decorrelates both into aggregate+join — the planner
    // shape SQL-first users write constantly; comparison kept exact
    // in integers per group (cents * n_g > sum_g).
    "q_correlated_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_csq_orders")
      s.sql("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above
        FROM graft_csq_orders o
        WHERE CAST(floor(o.o_totalprice * 100) AS BIGINT) *
              (SELECT count(*) FROM graft_csq_orders i
               WHERE i.o_orderpriority = o.o_orderpriority) >
              (SELECT sum(CAST(floor(i.o_totalprice * 100) AS BIGINT))
               FROM graft_csq_orders i
               WHERE i.o_orderpriority = o.o_orderpriority)
        GROUP BY o_orderpriority""")
    }),

    // Two-proportion z-test over a deterministic hash split (arm =
    // user_id parity; conversion = purchase share >= 20% of the
    // user's events, an exact integer test that stays non-degenerate
    // at any SF where "any purchase" saturates to 100%): the A/B
    // analysis read-out, entirely from integer counts — two hash
    // aggregations (per-user flag fold, then the conditional arm
    // pivot) and one closed-form double expression shared textually
    // with the oracle (zero-variance guard included).
    "q_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 5L)
          .otherwise(0L)) >= count(lit(1))).cast("long").as("conv"))
        .withColumn("arm", col("user_id") % 2L)
      users
        .agg(
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("k0"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("k1"))
        .selectExpr("n0", "k0", "n1", "k1",
          AbUpliftExpr + " AS uplift", AbZExpr + " AS z")
    }),

    // Association rules over per-user event-type sets: pair support,
    // directional confidence, and lift — all integer counts plus
    // exact ppm floor divisions (the market-basket read-out; the
    // grouped posting-list pair generation of q_node_sim, plus the
    // tiny per-type count and 1-row total broadcasts).
    "q_assoc_rules" -> ((s, d) => {
      // persisted: the distinct (user, type) frame feeds the per-type
      // counts, the 1-row total, AND the posting-list pair pipeline —
      // without the cache each consumer replays the events scan
      val e = Tables.events(s, d)
        .select(col("user_id").as("u"), col("event_type").as("t"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ct = e.groupBy(col("t")).agg(count(lit(1)).as("c"))
      val total = e.select(col("u")).distinct().agg(count(lit(1)).as("users"))
      val pairs = e
        .groupBy(col("u"))
        .agg(array_sort(collect_list(col("t"))).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(col("ts")).as("a"), col("ts"))
        .select(col("a"), explode(col("ts")).as("b"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("support"))
      pairs
        .join(broadcast(ct.select(col("t").as("a"), col("c").as("ca"))), Seq("a"))
        .join(broadcast(ct.select(col("t").as("b"), col("c").as("cb"))), Seq("b"))
        .crossJoin(broadcast(total))
        .selectExpr("a", "b", "support", "ca", "cb", "users",
          "(1000000 * support) div ca AS conf_a_b_ppm",
          "(1000000 * support) div cb AS conf_b_a_ppm",
          "(1000000 * support * users) div (ca * cb) AS lift_ppm")
    })
  )

  /** Shared closed-form expression texts for the A/B read-out —
    * interpolated into both the Spark selectExpr and the oracle.
    */
  private val AbUpliftExpr: String =
    "CAST(k1 AS DOUBLE)/n1 - CAST(k0 AS DOUBLE)/n0"
  /** Poisson-style burst z from the integer excess d7 = 7·cnt − Σwin
    * and its trailing sum; shared Spark↔oracle token for token. */
  private val BurstZExpr: String =
    """CASE WHEN sumw IS NULL OR sumw = 0 THEN NULL
       ELSE CAST(d7 AS DOUBLE)/(7.0*sqrt(CAST(sumw AS DOUBLE)/7.0))
       END"""

  /** Per-cell PMI-weighted MI contribution from exact counts; shared
    * Spark↔oracle token for token. */
  private val MiPartExpr: String =
    """(CAST(n_xy AS DOUBLE)/CAST(n AS DOUBLE)) *
       ln((CAST(n_xy AS DOUBLE)*CAST(n AS DOUBLE)) /
          (CAST(nx AS DOUBLE)*CAST(ny AS DOUBLE)))"""

  private val AbZExpr: String =
    """CASE WHEN n0 = 0 OR n1 = 0 OR k0 + k1 = 0
            OR k0 + k1 = n0 + n1 THEN 0.0
       ELSE (CAST(k1 AS DOUBLE)/n1 - CAST(k0 AS DOUBLE)/n0) /
       sqrt((CAST(k0 + k1 AS DOUBLE)/(n0 + n1)) *
            (1.0 - CAST(k0 + k1 AS DOUBLE)/(n0 + n1)) *
            (1.0/n0 + 1.0/n1)) END"""

  /** Shuffle key: affine hash (the KMV constants) × 2^31 + id mod
    * 2^31 — one sortable long; shared by the Spark plan and the
    * oracle ORDER BY.
    */
  private val ShuffleKeySql: String = {
    val p = graft.functions.KmvSketch.P
    val a = graft.functions.KmvSketch.HashA
    val b = graft.functions.KmvSketch.HashB
    s"((($a * (doc_id % $p) + $b) % $p) * 2147483648) + (doc_id % 2147483648)"
  }

  /** Dirty URL whose CANONICAL form collides across documents
    * (path/host from small moduli of the id): distinct raw URLs,
    * shared canonical resources — the input shape URL dedup exists
    * for. Engine-portable text shared with the oracle.
    */
  private val CollidingUrlSql: String =
    """'HTTPS://Example-' || CAST(doc_id % 7 AS STRING) ||
       '.COM:443/Docs/' || CAST(doc_id % 50 AS STRING) || '/#sec' ||
       CAST(doc_id AS STRING)"""

  /** Deterministically-dirty URL (mixed case, default port, tracking
    * params, fragment, trailing slash) — engine-portable SQL text
    * shared by the Spark projection and the oracle.
    */
  private val DirtyUrlSql: String =
    """CASE WHEN doc_id % 2 = 0
       THEN 'HTTPS://Example-' || CAST(doc_id % 7 AS STRING) ||
            '.COM:443/Docs/' || CAST(doc_id AS STRING) || '/#sec' ||
            CAST(doc_id % 4 AS STRING)
       ELSE 'HTTPS://Example-' || CAST(doc_id % 7 AS STRING) ||
            '.COM:443/Docs/' || CAST(doc_id AS STRING) || '?id=' ||
            CAST(doc_id % 50 AS STRING) || '&utm_source=s' ||
            CAST(doc_id % 3 AS STRING) || '&utm_campaign=c#sec' ||
            CAST(doc_id % 4 AS STRING)
       END"""

  /** LSH pairs oracle: the SAME hyperplane bucket arithmetic
    * (VectorExpressions.bucketSql), the SAME ≤1-bit candidate rule
    * (Spark probes by 1-bit flips; bit_count(xor) ≤ 1 is the
    * equivalent pair predicate), the SAME left-to-right cosine.
    */
  /** Shared SCD2 history CTE chain ending at `h` (user_id,
    * event_type, valid_from, valid_to) — the q_scd2 build, reused by
    * the point-in-time lookup oracle.
    */
  private val scdHistCtes: String =
    """m AS (SELECT user_id, ts, event_id, event_type,
            lag(event_type) OVER w AS prev_attr,
            lag(event_id) OVER w AS prev_ord
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        ch AS (SELECT user_id, ts, event_id, event_type FROM m
               WHERE prev_ord IS NULL OR prev_attr IS DISTINCT FROM event_type),
        h AS (SELECT user_id, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS valid_to
              FROM ch)"""

  private def lshPairsSql: String = {
    val dot = (1 to 64)
      .map(i => s"CAST(a.v[$i] AS DOUBLE)*CAST(b.v[$i] AS DOUBLE)").mkString(" + ")
    val na = (1 to 64)
      .map(i => s"CAST(a.v[$i] AS DOUBLE)*CAST(a.v[$i] AS DOUBLE)").mkString(" + ")
    val nb = (1 to 64)
      .map(i => s"CAST(b.v[$i] AS DOUBLE)*CAST(b.v[$i] AS DOUBLE)").mkString(" + ")
    val bucket = graft.functions.VectorExpressions.bucketSql(
      "embedding", graft.ops.Similarity.DefaultPlanes, 64)
    s"""WITH e AS (SELECT vec_id AS id, embedding AS v, $bucket AS bucket FROM embeddings)
        SELECT a.id AS vec_id_a, b.id AS vec_id_b
        FROM e a JOIN e b ON a.id < b.id AND bit_count(xor(a.bucket, b.bucket)) <= 1
        WHERE ($dot) / (sqrt($na) * sqrt($nb)) >= 0.45"""
  }

  /** 3-d Morton twin: closed-form 48-term bit OR, MSB-first packing
    * (dim i's bit b lands at position 3b + (2 − i)) — the exact
    * layout `ZOrderExpression.interleaveN` produces.
    */
  private def zorder3Sql: String = {
    val terms = (0 until 16).flatMap(b => Seq(
      s"(((x >> $b) & 1) << ${3 * b + 2})",
      s"(((y >> $b) & 1) << ${3 * b + 1})",
      s"(((z >> $b) & 1) << ${3 * b})")).mkString(" | ")
    s"""WITH b AS (SELECT o_orderkey AS order_id,
          o_custkey & 65535 AS x,
          (CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 65535 AS y,
          CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) & 65535 AS z
        FROM orders)
        SELECT order_id, CAST($terms AS BIGINT) AS zkey3 FROM b"""
  }

  /** 3-d Hilbert twin: Skilling's transpose algorithm unrolled — one
    * MATERIALIZED CTE layer per inverse-undo round (the three
    * per-dimension exchange/invert steps of a round fold into nested
    * CASE trees inside the layer; x0 threads through them), then Gray
    * encode, the twist fold as a linear xor chain, the twist applied,
    * and the MSB-first interleave. Materialization keeps the alias
    * chain LINEAR — inlined, each round's multiple references to the
    * previous round's coordinates grow the expression tree
    * exponentially (the q_hilbert lesson, one dimension up).
    */
  private def hilbert3Sql: String = {
    val bits = 16
    val layers = new StringBuilder
    var li = 0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      val np = 65535L ^ p // x & np == x & ~p for 16-bit x
      val (x0, x1, x2) = (s"x$li", s"y$li", s"z$li")
      // step i=0: exchange with itself is a no-op; only the invert arm acts
      val a0 = s"(CASE WHEN ($x0 & $q) != 0 THEN xor($x0, $p) ELSE $x0 END)"
      // step i=1: invert x0, or exchange the low-p bits of (x0, x1)
      val b0 = s"(CASE WHEN ($x1 & $q) != 0 THEN xor($a0, $p)" +
        s" ELSE (($a0 & $np) | ($x1 & $p)) END)"
      val b1 = s"(CASE WHEN ($x1 & $q) != 0 THEN $x1" +
        s" ELSE (($x1 & $np) | ($a0 & $p)) END)"
      // step i=2: same against the post-step-1 x0
      val c0 = s"(CASE WHEN ($x2 & $q) != 0 THEN xor($b0, $p)" +
        s" ELSE (($b0 & $np) | ($x2 & $p)) END)"
      val c2 = s"(CASE WHEN ($x2 & $q) != 0 THEN $x2" +
        s" ELSE (($x2 & $np) | ($b0 & $p)) END)"
      layers ++= s""",
        g${li + 1} AS MATERIALIZED (SELECT order_id, $c0 AS x${li + 1},
          $b1 AS y${li + 1}, $c2 AS z${li + 1} FROM g$li)"""
      li += 1
      q >>= 1
    }
    // Gray encode: y ^= x, then z ^= (new y)
    val gray = s""",
      gray AS MATERIALIZED (SELECT order_id, x$li AS gx,
        xor(y$li, x$li) AS gy, xor(z$li, xor(y$li, x$li)) AS gz FROM g$li)"""
    // twist fold over the LAST dimension, high bit to 2
    val t = (0 until bits - 1).map(i => 1L << (bits - 1 - i))
      .foldLeft("CAST(0 AS BIGINT)") { (acc, qq) =>
        s"xor($acc, CASE WHEN (gz & $qq) != 0 THEN ${qq - 1} ELSE 0 END)"
      }
    val fin = s""",
      tl AS MATERIALIZED (SELECT order_id, gx, gy, gz, $t AS t FROM gray),
      fin AS MATERIALIZED (SELECT order_id, xor(gx, t) AS fx,
        xor(gy, t) AS fy, xor(gz, t) AS fz FROM tl)"""
    val terms = (0 until bits).flatMap(b => Seq(
      s"(((fx >> $b) & 1) << ${3 * b + 2})",
      s"(((fy >> $b) & 1) << ${3 * b + 1})",
      s"(((fz >> $b) & 1) << ${3 * b})")).mkString(" | ")
    s"""WITH g0 AS MATERIALIZED (SELECT o_orderkey AS order_id,
          o_custkey & 65535 AS x0,
          (CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 65535 AS y0,
          CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) & 65535 AS z0
        FROM orders)$layers$gray$fin
        SELECT order_id, CAST($terms AS BIGINT) AS hkey3 FROM fin"""
  }

  /** Unrolled 3-round k-core peel; canonical (least, greatest)
    * undirected edges. Every round CTE is MATERIALIZED: each e_t is
    * referenced three times by round t+1, so inlined CTEs re-expand
    * the whole chain 3^t-fold — enough to OOM DuckDB at round 3 on
    * the full surface run. Joins, not IN-subqueries, for the same
    * reason.
    */
  private def kcoreSql: String = {
    def peel(t: Int, prev: String): String =
      s"""d$t AS MATERIALIZED (SELECT v, count(*) AS c FROM (
            SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev)
            GROUP BY v),
          k$t AS MATERIALIZED (SELECT v FROM d$t WHERE c >= 2),
          e$t AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
            JOIN k$t ka ON e.a = ka.v
            JOIN k$t kb ON e.b = kb.v)"""
    s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
        e0 AS MATERIALIZED (SELECT DISTINCT
            least(2*l_suppkey + 1, 2*l_partkey) AS a,
            greatest(2*l_suppkey + 1, 2*l_partkey) AS b FROM li),
        ${peel(1, "e0")},
        ${peel(2, "e1")},
        ${peel(3, "e2")}
        SELECT v AS node, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
        GROUP BY v"""
  }

  /** k-truss twin: two unrolled support-peel rounds over the
    * canonical a<b edge list — tri enumerates each triangle once,
    * support credits its three edges, the filter keeps s >= k-2 (an
    * inner join drops zero-support edges, which the k >= 3 filter
    * would drop anyway); final support recomputed on the survivors.
    */
  private def ktrussSql: String = {
    def peel(t: Int, prev: String): String =
      s"""tri$t AS MATERIALIZED (SELECT e1.a u, e1.b v, e2.b w
            FROM $prev e1 JOIN $prev e2 ON e1.a = e2.a AND e1.b < e2.b
            JOIN $prev e3 ON e3.a = e1.b AND e3.b = e2.b),
          s$t AS MATERIALIZED (SELECT a, b, count(*) AS s FROM (
            SELECT u AS a, v AS b FROM tri$t
            UNION ALL SELECT u, w FROM tri$t
            UNION ALL SELECT v, w FROM tri$t) x GROUP BY 1, 2),
          e$t AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
            JOIN s$t USING (a, b) WHERE s >= 1)"""
    s"""WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey p
          FROM lineitem),
        e0 AS MATERIALIZED (SELECT a, b FROM (
          SELECT x.p a, y.p b, count(*) w FROM li x
          JOIN li y ON x.o = y.o AND x.p < y.p GROUP BY 1, 2) t
          WHERE w >= 2),
        ${peel(1, "e0")},
        ${peel(2, "e1")},
        trif AS MATERIALIZED (SELECT t1.a u, t1.b v, t2.b w
          FROM e2 t1 JOIN e2 t2 ON t1.a = t2.a AND t1.b < t2.b
          JOIN e2 t3 ON t3.a = t1.b AND t3.b = t2.b),
        sf AS (SELECT a, b, count(*) AS s FROM (
          SELECT u AS a, v AS b FROM trif
          UNION ALL SELECT u, w FROM trif
          UNION ALL SELECT v, w FROM trif) x GROUP BY 1, 2)
        SELECT e.a AS node_a, e.b AS node_b,
          CAST(COALESCE(sf.s, 0) AS BIGINT) AS support
        FROM e2 e LEFT JOIN sf ON e.a = sf.a AND e.b = sf.b"""
  }

  val oracleSql: Map[String, String] = Map(
    // same unique (ts, event_id) ordering, integer-µs gap test, ROWS
    // running sum — window semantics replicate exactly
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
         m AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM e),
         f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                              THEN 1 ELSE 0 END AS nf FROM m),
         s AS (SELECT *, sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS seq FROM f),
         s2 AS (SELECT *, first_value(event_id) OVER (PARTITION BY user_id, seq
                  ORDER BY ts, event_id) AS fid FROM s)
         SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
                CAST(count(*) AS BIGINT) AS n_events,
                min(fid) AS first_event_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                (max(us) - min(us)) // 1000000 AS duration_sec
         FROM s2 GROUP BY user_id, seq""",
    // islands twin of the native session_window agg: break on
    // diff >= gap (an event merges only while ts < last_ts + gap),
    // end = last ts + gap
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
         m AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev FROM e),
         f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000
                              THEN 1 ELSE 0 END AS nf FROM m),
         s AS (SELECT *, sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS seq FROM f)
         SELECT user_id,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
                  AS session_end,
                CAST(count(*) AS BIGINT) AS n_events,
                min(event_id) AS first_min_id
         FROM s GROUP BY user_id, seq""",

    // each event expands to its two covering 30-min-aligned 1-hour
    // windows (epoch-aligned, same as Spark's window())
    "q_hopping" ->
      """WITH e AS (SELECT event_type,
                      time_bucket(INTERVAL 30 MINUTES, ts) AS b FROM events),
         u AS (SELECT event_type,
                 unnest([b, b - INTERVAL 30 MINUTES]) AS ws FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
                CAST(count(*) AS BIGINT) AS n
         FROM u GROUP BY 1, 2""",

    // same (us, eid) ordering and ROWS [unbounded, -1] frames; each
    // window layer is a CTE because window functions can't nest
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type AS etype, epoch_us(ts) AS us,
                    event_id AS eid FROM events),
         t1 AS (SELECT *, CASE WHEN etype = 'signup' THEN us END AS q1 FROM e),
         t2 AS (SELECT *, min(q1) OVER wp AS r1 FROM t1
                WINDOW wp AS (PARTITION BY user_id ORDER BY us, eid
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         t3 AS (SELECT *, CASE WHEN etype = 'click' AND r1 IS NOT NULL
                     AND us - r1 <= 604800000000 THEN us END AS q2 FROM t2),
         t4 AS (SELECT *, min(q2) OVER wp AS r2 FROM t3
                WINDOW wp AS (PARTITION BY user_id ORDER BY us, eid
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         t5 AS (SELECT *, CASE WHEN etype = 'purchase' AND r2 IS NOT NULL
                     AND us - r1 <= 604800000000 THEN us END AS q3 FROM t4),
         pu AS (SELECT user_id, min(q1) AS m1, min(q2) AS m2, min(q3) AS m3
                FROM t5 GROUP BY user_id),
         tot AS (SELECT
             CAST(count(m1) AS BIGINT) AS n1,
             CAST(count(m2) AS BIGINT) AS n2,
             CAST(count(m3) AS BIGINT) AS n3 FROM pu)
         SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name, n1 AS n_users,
                CAST(n1 AS DOUBLE) / n1 AS pct_of_first FROM tot
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM tot
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'purchase', n3, CAST(n3 AS DOUBLE) / n1 FROM tot""",
    "q_retention" ->
      """WITH e AS (SELECT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS event_week FROM events),
         c AS (SELECT *, min(event_week) OVER (PARTITION BY user_id) AS cohort_week
               FROM e)
         SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
                CAST((event_week - cohort_week) // 7 AS BIGINT) AS week_offset,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
         FROM c GROUP BY 1, (event_week - cohort_week) // 7""",
    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders
                    WHERE o_orderkey % 3 <> 0),
         n AS (SELECT o_orderkey AS k,
                 o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 1.0 ELSE 0.0 END AS v
               FROM orders WHERE o_orderkey % 5 <> 0)
         SELECT COALESCE(o.k, n.k) AS o_orderkey,
           CASE WHEN o.k IS NULL THEN 'added'
                WHEN n.k IS NULL THEN 'removed'
                WHEN o.v IS NOT DISTINCT FROM n.v THEN 'unchanged'
                ELSE 'changed' END AS change_type
         FROM o FULL OUTER JOIN n ON o.k = n.k""",
    "q_scd2" ->
      s"""WITH $scdHistCtes
          SELECT user_id, event_type,
            strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
            strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
            CAST(valid_to IS NULL AS BIGINT) AS is_current
          FROM h""",
    "q_scd2_lookup" ->
      s"""WITH $scdHistCtes,
          f AS (SELECT user_id, ts FROM events WHERE event_id % 37 = 0)
          SELECT f.user_id,
            strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts,
            h.event_type,
            strftime(h.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from
          FROM f LEFT JOIN h
            ON f.user_id = h.user_id AND h.valid_from <= f.ts
               AND (h.valid_to IS NULL OR f.ts < h.valid_to)""",
    "q_range_join" ->
      """WITH t AS (SELECT event_id AS id, epoch_us(ts) AS t FROM events)
         SELECT a.id AS event_id, count(b.id) AS n_neighbors
         FROM t a LEFT JOIN t b
           ON b.t BETWEEN a.t - 60000000 AND a.t + 60000000 AND b.id <> a.id
         GROUP BY a.id""",
    "q_pagerank" -> {
      val S = graft.ops.Graphs.Scale
      def round(r: Int, prev: String): String =
        s"""c$r AS (SELECT e.dst AS node, sum(p.r // d.outdeg) AS s
              FROM edges e JOIN $prev p ON e.src = p.node
              JOIN deg d ON e.src = d.src GROUP BY e.dst),
            r$r AS (SELECT n.node,
                ${15L * S / 100L} + (85 * COALESCE(c.s, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c$r c USING (node))"""
      s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
          edges AS (
            SELECT DISTINCT src, dst FROM (
              SELECT 2*l_suppkey + 1 AS src, 2*l_partkey AS dst FROM li
              UNION ALL
              SELECT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM li)),
          nodes AS (SELECT DISTINCT src AS node FROM edges
                    UNION SELECT DISTINCT dst FROM edges),
          deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
          r0 AS (SELECT node, CAST($S AS BIGINT) AS r FROM nodes),
          ${round(1, "r0")},
          ${round(2, "r1")},
          ${round(3, "r2")}
          SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3"""
    },
    // unrolled 3 rounds; per-walk min over the packed (hash<<31 | n)
    // long, so no arg_min tie-break semantics leak in
    "q_walks" -> {
      val P = 2147483647L
      val A = 1610612741L
      val B = 805306457L
      val A2 = 1566083941L
      val B2 = 12345L
      val pk = 2147483648L
      def step(t: Int, prev: String): String =
        s"""w$t AS (SELECT s.start, e.dst AS n,
              ((s.start*131 + ${17L * t} + e.dst) % $P) AS v
            FROM $prev s JOIN edges e ON e.src = s.c),
           x$t AS (SELECT start, n, (($A*v + $B) % $P) AS x FROM w$t),
           y$t AS (SELECT start, n, (((x*x % $P)*$A2 + $B2) % $P) AS y FROM x$t),
           s$t AS (SELECT start, min(y*$pk + n) % $pk AS c FROM y$t GROUP BY start)"""
      s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
          edges AS (SELECT DISTINCT src, dst FROM (
            SELECT 2*l_suppkey+1 AS src, 2*l_partkey AS dst FROM li
            UNION ALL SELECT 2*l_partkey AS src, 2*l_suppkey+1 AS dst FROM li)),
          s0 AS (SELECT DISTINCT 2*l_suppkey+1 AS start,
                   2*l_suppkey+1 AS c FROM li),
          ${step(1, "s0")},
          ${step(2, "s1")},
          ${step(3, "s2")}
          SELECT start AS start_node, CAST(0 AS BIGINT) AS step, c AS node FROM s0
          UNION ALL SELECT start, 1, c FROM s1
          UNION ALL SELECT start, 2, c FROM s2
          UNION ALL SELECT start, 3, c FROM s3"""
    },

    // bit-identical Morton interleave, written as the naive 31-term
    // OR — deliberately not the shift-magic the engine uses
    "q_zorder" -> {
      val terms = (0 until 31).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (SELECT o_orderkey AS order_id,
            o_custkey & 2147483647 AS x,
            (CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 2147483647 AS y
          FROM orders)
          SELECT order_id, CAST($terms AS BIGINT) AS zkey FROM b"""
    },

    // Hilbert twin: the 16 quadrant-rotation rounds unrolled as
    // chained MATERIALIZED CTEs — materialization is what keeps the
    // alias chain LINEAR (inlined, each round's two references to the
    // previous round's (x, y) double the expression tree: 2^16 terms
    // hang the planner — measured before this form was chosen).
    "q_hilbert" -> {
      val n = 1L << 16
      val rounds = new StringBuilder
      var i = 0
      var s = n >> 1
      while (s > 0) {
        val (px, py, pd) = (s"x$i", s"y$i", s"d$i")
        val rx = s"(CASE WHEN ($px & $s) > 0 THEN 1 ELSE 0 END)"
        val ry = s"(CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END)"
        rounds ++= s""",
          h${i + 1} AS MATERIALIZED (SELECT order_id,
            $pd + $s*$s*xor(3*$rx, $ry) AS d${i + 1},
            CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
              THEN ${n - 1} - $py ELSE $py END) ELSE $px END AS x${i + 1},
            CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1
              THEN ${n - 1} - $px ELSE $px END) ELSE $py END AS y${i + 1}
            FROM h$i)"""
        i += 1
        s >>= 1
      }
      s"""WITH h0 AS MATERIALIZED (SELECT o_orderkey AS order_id,
            o_custkey & ${n - 1} AS x0,
            (CAST(o_orderdate AS DATE) - DATE '1970-01-01') & ${n - 1} AS y0,
            CAST(0 AS BIGINT) AS d0
          FROM orders)$rounds
          SELECT order_id, CAST(d$i AS BIGINT) AS hkey FROM h$i"""
    },

    // canonical a<b edges make each triangle (u<v<w) appear exactly
    // once in the plain 3-way join — no orientation needed for the
    // oracle, which is the point: the engine's degree-oriented plan
    // must reproduce the naive semantics. li/e/tri are MATERIALIZED:
    // DuckDB inlines plain CTEs per reference (e feeds deg + three
    // join legs, tri feeds three unnests), and the inlined expansion
    // both recomputes the edge distinct five times and doubles peak
    // memory (measured 524 → 285 MB).
    "q_triangles" ->
      """WITH li AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS MATERIALIZED (SELECT DISTINCT a.p AS a, b.p AS b
               FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
                 FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) t
                 GROUP BY v),
         tri AS MATERIALIZED (SELECT e1.a AS u, e1.b AS v, e2.b AS w
                 FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                 JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         pn AS (SELECT x AS node, count(*) AS t
                FROM (SELECT u AS x FROM tri UNION ALL SELECT v FROM tri
                      UNION ALL SELECT w FROM tri) q GROUP BY x)
         SELECT d.v AS part_id, d.deg AS degree,
                CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
                CASE WHEN d.deg >= 2
                     THEN 2.0 * COALESCE(t, 0) / (d.deg * (d.deg - 1))
                     ELSE 0.0 END AS clustering
         FROM deg d LEFT JOIN pn ON d.v = pn.node""",
    "q_fuzzy_join" ->
      """WITH keyed AS (
           SELECT s_suppkey AS id, s_name AS s,
             unnest(list_distinct(list_prepend(s_name,
               list_transform(range(1, length(s_name) + 1),
                 i -> substr(s_name, 1, i - 1) ||
                      substr(s_name, i + 1, length(s_name)))))) AS k
           FROM supplier WHERE s_name IS NOT NULL),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b
                  FROM keyed a JOIN keyed b USING (k) WHERE a.id < b.id),
         pairs AS (SELECT id_a, id_b FROM cand WHERE levenshtein(s_a, s_b) <= 1),
         und AS (SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs),
         cnt AS (SELECT id, count(*) AS n_fuzzy FROM und GROUP BY id)
         SELECT s_suppkey AS supp_id, COALESCE(n_fuzzy, 0) AS n_fuzzy
         FROM supplier LEFT JOIN cnt ON s_suppkey = cnt.id""",
    "q_window_range" ->
      """SELECT o_custkey AS cust_id, o_orderkey AS order_id,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30d,
           count(*) OVER w AS n_30d
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""",
    "q_asof_join" ->
      """SELECT event_id, user_id, strftime(o_orderdate, '%Y-%m-%d') AS last_order_date
         FROM events ASOF LEFT JOIN orders
         ON events.user_id = orders.o_custkey AND events.ts >= orders.o_orderdate""",
    "q_dedup_embedding" -> lshPairsSql,
    "q_bloom_semi_join" ->
      """SELECT l_orderkey, l_partkey FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)""",
    "q_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_events
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment""",
    "q_join3" ->
      """SELECT l_orderkey AS order_id,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey LIMIT 20""",
    // merged per-group sketches == the from-scratch global sketch, so
    // the oracle recomputes the global k minima directly
    "q_kmv_merge" -> {
      import graft.functions.KmvSketch.{HashA, HashA2, HashB, HashB2, P}
      s"""WITH h0 AS (SELECT DISTINCT
              (($HashA*(user_id % $P) + $HashB) % $P + $P) % $P AS x
            FROM events WHERE user_id IS NOT NULL),
          h AS (SELECT DISTINCT
              (((x*x % $P) * $HashA2 + $HashB2) % $P + $P) % $P AS hv
            FROM h0),
          ranked AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn,
                            COUNT(*) OVER () AS n FROM h)
          SELECT
            (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM events)
              AS n_groups,
            CASE WHEN (SELECT max(n) FROM ranked) < 64
                 THEN CAST((SELECT max(n) FROM ranked) AS DOUBLE)
                 ELSE 63.0 * 2147483647.0 /
                   CAST((SELECT hv FROM ranked WHERE rn = 64) AS DOUBLE) END
              AS kmv_estimate,
            (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
              AS exact_distinct"""
    },
    // same cent-quantized integer sums; formulas parenthesized to the
    // identical IEEE operation sequence
    "q_ols_fit" ->
      """WITH t AS (SELECT l_returnflag AS g,
            CAST(floor(l_quantity*100) AS BIGINT) AS xq,
            CAST(floor(l_extendedprice*100) AS BIGINT) AS yq FROM lineitem),
         s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) AS DOUBLE) AS nd,
            CAST(sum(xq) AS DOUBLE) AS sx, CAST(sum(yq) AS DOUBLE) AS sy,
            CAST(sum(xq*xq) AS DOUBLE) AS sxx,
            CAST(sum(xq*yq) AS DOUBLE) AS sxy,
            CAST(sum(yq*yq) AS DOUBLE) AS syy
          FROM t GROUP BY g),
         s2 AS (SELECT g, n, nd, sx, sy,
            nd*sxx - sx*sx AS varx, nd*syy - sy*sy AS vary,
            nd*sxy - sx*sy AS cov FROM s),
         s3 AS (SELECT *, CASE WHEN varx = 0 THEN 0.0 ELSE cov/varx END AS beta1
                FROM s2)
         SELECT g AS l_returnflag, n,
           (sy - beta1*sx)/nd/100.0 AS beta0, beta1,
           CASE WHEN varx = 0 OR vary = 0 THEN 0.0
                ELSE (cov*cov)/(varx*vary) END AS r2
         FROM s3""",

    "q_quantile_reservoir" -> {
      val P = graft.functions.KmvSketch.P
      val A = graft.functions.KmvSketch.HashA
      val B = graft.functions.KmvSketch.HashB
      val A2 = graft.functions.KmvSketch.HashA2
      val B2 = graft.functions.KmvSketch.HashB2
      s"""WITH h0 AS (SELECT o_orderpriority AS g, o_totalprice AS v,
              (($A*(o_orderkey % $P) + $B) % $P + $P) % $P AS x
            FROM orders WHERE o_orderkey IS NOT NULL),
          h AS (SELECT g, v,
              (((x*x % $P) * $A2 + $B2) % $P + $P) % $P AS hv FROM h0),
          d AS (SELECT g, hv, min(v) AS v FROM h GROUP BY g, hv),
          r AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
                FROM d),
          s AS (SELECT g, v FROM r WHERE rn <= 64),
          q AS (SELECT g, CAST(count(*) AS BIGINT) AS m,
                  list_sort(list(v)) AS vs FROM s GROUP BY g)
          SELECT g AS o_orderpriority, m,
            vs[CAST(floor(0.5*(m-1)) AS BIGINT) + 1] AS p50_est,
            vs[CAST(floor(0.9*(m-1)) AS BIGINT) + 1] AS p90_est
          FROM q"""
    },
    "q_kmv_distinct" ->
      s"""WITH h0 AS (SELECT DISTINCT event_type,
              ((${graft.functions.KmvSketch.HashA}*(user_id % ${graft.functions.KmvSketch.P})
                + ${graft.functions.KmvSketch.HashB}) % ${graft.functions.KmvSketch.P}
               + ${graft.functions.KmvSketch.P}) % ${graft.functions.KmvSketch.P} AS x
            FROM events WHERE user_id IS NOT NULL),
          h AS (SELECT DISTINCT event_type,
              (((x*x % ${graft.functions.KmvSketch.P}) * ${graft.functions.KmvSketch.HashA2}
                + ${graft.functions.KmvSketch.HashB2}) % ${graft.functions.KmvSketch.P}
               + ${graft.functions.KmvSketch.P}) % ${graft.functions.KmvSketch.P} AS hv
            FROM h0),
          ranked AS (SELECT event_type, hv,
              ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n FROM h),
          exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS ed
                    FROM events GROUP BY event_type)
          SELECT e.event_type,
            CASE WHEN r.n < 64 THEN CAST(r.n AS DOUBLE)
                 ELSE 63.0 * ${graft.functions.KmvSketch.P} / kth.hv END AS kmv_estimate,
            CAST(e.ed AS BIGINT) AS exact_distinct
          FROM exact e
          JOIN (SELECT DISTINCT event_type, n FROM ranked) r ON r.event_type = e.event_type
          LEFT JOIN (SELECT event_type, hv FROM ranked WHERE rn = 64) kth
            ON kth.event_type = e.event_type""",
    // registers: bucket = hash % 64, rho = leftmost-1 position in the
    // 25-bit window (via length(bin(...))); estimate = raw HLL in
    // 2^-20 fixed point, one floor division — see HllSketch scaladoc
    "q_hll_custom" -> {
      val P = graft.functions.KmvSketch.P
      val A = graft.functions.KmvSketch.HashA
      val B = graft.functions.KmvSketch.HashB
      val A2 = graft.functions.KmvSketch.HashA2
      val B2 = graft.functions.KmvSketch.HashB2
      val alpha = graft.functions.HllSketch.AlphaFp20
      s"""WITH h0 AS (SELECT DISTINCT event_type,
              ((($A*(user_id % $P) + $B) % $P) + $P) % $P AS x
            FROM events WHERE user_id IS NOT NULL),
          h AS (SELECT DISTINCT event_type,
              ((((x*x % $P) * $A2 + $B2) % $P) + $P) % $P AS hv FROM h0),
          br AS (SELECT event_type, hv % 64 AS bucket,
                   CASE WHEN hv // 64 = 0 THEN 26
                        ELSE 26 - length(bin(hv // 64)) END AS rho FROM h),
          regs AS (SELECT event_type, bucket, max(rho) AS reg
                   FROM br GROUP BY 1, 2),
          z AS (SELECT event_type,
                  sum(CAST(1 AS BIGINT) << (26 - reg)) AS zs,
                  count(*) AS nb FROM regs GROUP BY 1),
          est AS (SELECT event_type,
                    (CAST($alpha AS BIGINT) * 4096 * (CAST(1 AS BIGINT) << 26))
                      // (zs + (64 - nb) * (CAST(1 AS BIGINT) << 26)) AS fp
                  FROM z),
          exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS ed
                    FROM events GROUP BY event_type)
          SELECT e.event_type, CAST(s.fp AS BIGINT) AS hll_fp20,
                 CAST(e.ed AS BIGINT) AS exact_distinct,
                 CAST(s.fp // 1048576 AS BIGINT) AS hll_est
          FROM exact e JOIN est s ON s.event_type = e.event_type"""
    },
    // per-group k-min sketches, pairwise union sketch via ROW_NUMBER,
    // shared = |A∩B∩U|; float formulas sequenced exactly as the engine
    "q_kmv_intersect" -> {
      val P = graft.functions.KmvSketch.P
      val A = graft.functions.KmvSketch.HashA
      val B = graft.functions.KmvSketch.HashB
      val A2 = graft.functions.KmvSketch.HashA2
      val B2 = graft.functions.KmvSketch.HashB2
      s"""WITH h0 AS (SELECT DISTINCT event_type,
              ((($A*(user_id % $P) + $B) % $P) + $P) % $P AS x
            FROM events WHERE user_id IS NOT NULL),
          h AS (SELECT DISTINCT event_type,
              ((((x*x % $P) * $A2 + $B2) % $P) + $P) % $P AS hv FROM h0),
          r AS (SELECT event_type, hv,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) rn
                FROM h),
          sk AS (SELECT event_type, hv FROM r WHERE rn <= 64),
          g AS (SELECT DISTINCT event_type FROM sk),
          pairs AS (SELECT a.event_type ga, b.event_type gb
                    FROM g a, g b WHERE a.event_type < b.event_type),
          uh AS (SELECT DISTINCT p.ga, p.gb, s.hv FROM pairs p
                 JOIN sk s ON s.event_type = p.ga OR s.event_type = p.gb),
          u AS (SELECT ga, gb, hv,
                  ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY hv) rn
                FROM uh),
          uk AS (SELECT ga, gb, hv, rn FROM u WHERE rn <= 64),
          us AS (SELECT ga, gb, count(*) usize,
                   max(CASE WHEN rn = 64 THEN hv END) kth FROM uk GROUP BY 1, 2),
          sh AS (SELECT uk.ga, uk.gb, count(*) c
                 FROM uk
                 JOIN sk sa ON sa.event_type = uk.ga AND sa.hv = uk.hv
                 JOIN sk sb ON sb.event_type = uk.gb AND sb.hv = uk.hv
                 GROUP BY 1, 2)
          SELECT us.ga AS group_a, us.gb AS group_b,
            CAST(COALESCE(sh.c, 0) AS BIGINT) AS shared_k,
            CAST(us.usize AS BIGINT) AS usize,
            (CASE WHEN us.usize < 64 THEN CAST(us.usize AS DOUBLE)
                  ELSE (63.0 * 2147483647.0) / CAST(us.kth AS DOUBLE) END)
              AS union_est,
            CAST(COALESCE(sh.c, 0) AS DOUBLE) / CAST(us.usize AS DOUBLE)
              AS jaccard_est,
            (CASE WHEN us.usize < 64 THEN CAST(us.usize AS DOUBLE)
                  ELSE (63.0 * 2147483647.0) / CAST(us.kth AS DOUBLE) END)
              * CAST(COALESCE(sh.c, 0) AS DOUBLE) / CAST(us.usize AS DOUBLE)
              AS intersect_est
          FROM us LEFT JOIN sh ON sh.ga = us.ga AND sh.gb = us.gb"""
    },
    "q_window_running" ->
      """SELECT o_custkey AS cust_id, o_orderkey AS order_id,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
         lag(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_price
         FROM orders""",
    "q_string_funcs" ->
      """SELECT p_partkey AS part_id,
         upper(p_name) AS upper_name,
         CAST(length(trim(p_name)) AS BIGINT) AS trim_len,
         lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS padded_id,
         translate(p_name, 'aeiou', 'AEIOU') AS translated,
         replace(p_name, ' ', '_') AS snake,
         substr(p_name, 1, 3) AS prefix,
         concat_ws('-', p_brand, p_type) AS brand_type
         FROM part""",
    "q_date_funcs" ->
      """SELECT o_orderkey AS order_id,
         CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(day(o_orderdate) AS BIGINT) AS d,
         CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
         strftime(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90,
         CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS BIGINT)
           AS days_to_2025,
         strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
         FROM orders""",
    "q_pivot" ->
      """SELECT user_id,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
         FROM events GROUP BY user_id""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
         count(*) AS n_orders,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q_histogram" ->
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                    FROM orders)
         SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)),
                           19.0) AS BIGINT) AS bin,
                count(*) AS n_orders
         FROM orders, b GROUP BY 1""",
    "q_histogram_eqdepth" ->
      """WITH dv AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
                     FROM documents GROUP BY 1),
          c AS (SELECT v, cnt, sum(cnt) OVER
                  (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum FROM dv),
          t AS (SELECT count(*) AS n FROM documents)
         SELECT CAST(((cum - cnt) * 8) // n AS BIGINT) AS bucket,
                CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
                CAST(sum(cnt) AS BIGINT) AS n_rows
         FROM c, t GROUP BY 1""",
    "q_anomaly" ->
      """WITH h AS (SELECT event_type AS series, strftime(ts, '%Y-%m-%d %H') AS hour,
                      count(*) AS cnt
                    FROM events GROUP BY 1, 2),
          w AS (SELECT series, hour, cnt,
                  sum(cnt) OVER win AS s,
                  sum(cnt*cnt) OVER win AS sxx,
                  count(*) OVER win AS nb
                FROM h WINDOW win AS (PARTITION BY series ORDER BY hour
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         SELECT series, hour, CAST(cnt AS BIGINT) AS cnt,
           CAST(s AS BIGINT) AS baseline_sum,
           CAST(24*cnt - s AS BIGINT) AS dev,
           CAST(24*sxx - s*s AS BIGINT) AS var_nsq,
           CAST(CASE WHEN (24*cnt - s)*(24*cnt - s) > 9*(24*sxx - s*s)
                THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         FROM w WHERE nb = 24""",
    "q_quantiles_exact" ->
      """WITH d AS (SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
          c AS (SELECT g, v, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n
           FROM d)
         SELECT g AS l_returnflag,
           CAST(min(CASE WHEN cum*4 >= n THEN v END) AS BIGINT) AS p25_cents,
           CAST(min(CASE WHEN cum*2 >= n THEN v END) AS BIGINT) AS p50_cents,
           CAST(min(CASE WHEN cum*4 >= n*3 THEN v END) AS BIGINT) AS p75_cents,
           CAST(min(CASE WHEN cum*10 >= n*9 THEN v END) AS BIGINT) AS p90_cents
         FROM c GROUP BY 1""",
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS qty_cents,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS price_cents,
             CAST(count(*) AS BIGINT) AS n_items
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'qty_cents' AS metric, qty_cents AS value FROM a
         UNION ALL
         SELECT l_returnflag, 'price_cents' AS metric, price_cents AS value FROM a
         UNION ALL
         SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM a""",
    "q_intersect" ->
      """SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'F'""",
    "q_except" ->
      """SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'F'""",
    "q_intersect_all" ->
      """SELECT l_suppkey AS supp_id FROM lineitem WHERE l_returnflag = 'A'
         INTERSECT ALL
         SELECT l_suppkey AS supp_id FROM lineitem WHERE l_returnflag = 'R'""",
    "q_except_all" ->
      """SELECT l_suppkey AS supp_id FROM lineitem WHERE l_returnflag = 'A'
         EXCEPT ALL
         SELECT l_suppkey AS supp_id FROM lineitem WHERE l_returnflag = 'R'""",
    "q_join_full" ->
      """WITH e AS (SELECT user_id AS key_id, COUNT(*) AS n_events
                    FROM events GROUP BY user_id),
          o AS (SELECT o_custkey AS key_id, COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey)
         SELECT COALESCE(e.key_id, o.key_id) AS key_id,
                COALESCE(e.n_events, 0) AS n_events,
                COALESCE(o.n_orders, 0) AS n_orders
         FROM e FULL OUTER JOIN o ON e.key_id = o.key_id""",
    "q_window_misc" ->
      """SELECT o_orderstatus, o_orderkey,
              CAST(NTILE(4) OVER w AS INTEGER) AS tile4,
              PERCENT_RANK() OVER w AS pct_rank,
              CUME_DIST() OVER w AS cume,
              LEAD(o_orderkey, 1) OVER w AS next_key,
              LAG(o_orderkey, 1) OVER w AS prev_key
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice ASC, o_orderkey ASC)""",
    "q_anti_join" ->
      """SELECT c_custkey AS cust_id, c_name AS name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q_explode_2level" ->
      """SELECT bigram, COUNT(*) AS cnt FROM (
           SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS bigram
           FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
                 FROM documents) t
           WHERE length(w) >= 2)
         GROUP BY bigram""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
         FROM events""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         FROM events GROUP BY event_type""",
    // AMS F2: the ±1-hash family regenerates from the SAME
    // Moments.AmsAB constants the engine uses, so the 32 counters,
    // the double squares, the sorted median read, and the ratio are
    // token-identical.
    "q_f2_sketch" -> {
      val p = graft.ops.Dedup.MinHashP
      val cSums = Moments.AmsAB.zipWithIndex.map { case ((a, b), j) =>
        s"sum((1 - 2*((($a*(k % $p) + $b) % $p) % 2)) * f) AS c$j"
      }.mkString(",\n              ")
      val arr = Moments.AmsAB.indices
        .map(j => s"CAST(c$j AS DOUBLE)*CAST(c$j AS DOUBLE)")
        .mkString("[", ",\n              ", "]")
      s"""WITH perkey AS (SELECT user_id AS k, count(*) AS f
              FROM events GROUP BY 1),
          c AS (SELECT CAST(sum(f) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS n_keys,
              sum(CAST(f AS DECIMAL(18,0)) * CAST(f AS DECIMAL(18,0))) AS f2x,
              $cSums
            FROM perkey),
          s AS (SELECT *, list_sort($arr) AS arr FROM c)
          SELECT n, n_keys, CAST(f2x AS DOUBLE) AS f2_exact,
            (arr[16] + arr[17]) / 2.0 AS f2_est,
            ((arr[16] + arr[17]) / 2.0) / CAST(f2x AS DOUBLE) AS est_ratio
          FROM s"""
    },
    // Bounded-error sketch oracles: exact values + literal TRUE; the
    // Spark side computes the booleans from the estimates, so the hash
    // match certifies the ε-bound (see the queries' scaladoc).
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
                COUNT(*) AS n_events, TRUE AS within_3rsd
         FROM events GROUP BY event_type""",
    "q_approx_quantiles" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
              COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
            FROM orders)
         SELECT o_orderstatus,
                MAX(CASE WHEN rn = (cnt + 1) // 2 THEN o_totalprice END) AS p50_exact,
                MAX(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT)
                    THEN o_totalprice END) AS p90_exact,
                TRUE AS p50_in_bounds, TRUE AS p90_in_bounds
         FROM r GROUP BY o_orderstatus""",
    "q_median_disc" ->
      """SELECT l_returnflag, l_extendedprice AS median_price FROM
         (SELECT l_returnflag, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
          FROM lineitem) t
         WHERE rn = (cnt + 1) // 2""",

    // same cumulative distribution, same integer rank/remainder
    // arithmetic, same single closing double expression
    "q_percentile_cont" ->
      """WITH t AS (SELECT o_orderstatus AS g,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
           FROM orders),
          d AS (SELECT g, v, count(*) AS cnt FROM t GROUP BY 1, 2),
          c AS (SELECT g, v,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n
           FROM d),
          a AS (SELECT g,
             min(CASE WHEN cum >= ((n-1)//2) + 1 THEN v END) AS v50lo,
             min(CASE WHEN cum >= (n//2) + 1 THEN v END) AS v50hi,
             min(CASE WHEN cum >= (((n-1)*9)//10) + 1 THEN v END) AS v90lo,
             min(CASE WHEN cum >= (((n-1)*9)//10) +
                 (CASE WHEN ((n-1)*9)%10 > 0 THEN 1 ELSE 0 END) + 1
               THEN v END) AS v90hi,
             min((n-1)%2) AS rem5, min(((n-1)*9)%10) AS rem9
           FROM c GROUP BY g)
         SELECT g AS o_orderstatus,
           (CAST(v50lo AS DOUBLE) + (CAST(v50hi AS DOUBLE) - CAST(v50lo AS DOUBLE))
              * (CAST(rem5 AS DOUBLE) / 2.0)) / 100.0 AS p50_cont,
           (CAST(v90lo AS DOUBLE) + (CAST(v90hi AS DOUBLE) - CAST(v90lo AS DOUBLE))
              * (CAST(rem9 AS DOUBLE) / 10.0)) / 100.0 AS p90_cont
         FROM a""",

    // unrolled reachable sets; dist = first round a node appears in
    // (reach sets are monotone, so min over the unions IS hop count)
    "q_bfs" -> {
      // MATERIALIZED: r_{t-1} is referenced twice per round — inlined
      // CTEs would re-expand the chain 2^t-fold
      def round(t: Int, prev: String): String =
        s"""r$t AS MATERIALIZED (SELECT node FROM $prev
              UNION SELECT e.dst FROM edges e JOIN $prev p ON e.src = p.node)"""
      s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
          edges AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
              SELECT 2*l_suppkey + 1 AS src, 2*l_partkey AS dst FROM li
              UNION ALL
              SELECT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM li)),
          r0 AS (SELECT DISTINCT 2*l_suppkey + 1 AS node FROM li
                 WHERE l_suppkey % 10 = 0),
          ${round(1, "r0")},
          ${round(2, "r1")},
          ${round(3, "r2")}
          SELECT node, CAST(min(d) AS BIGINT) AS dist FROM (
            SELECT node, 0 AS d FROM r0
            UNION ALL SELECT node, 1 FROM r1
            UNION ALL SELECT node, 2 FROM r2
            UNION ALL SELECT node, 3 FROM r3)
          GROUP BY node"""
    },

    // same spine (per-user generate_series), same ROWS-frame
    // IGNORE NULLS forward fill
    "q_gapfill" ->
      """WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n, max(value) AS vmax
            FROM events WHERE user_id < 40 GROUP BY 1, 2),
          b AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
                FROM hourly GROUP BY 1),
          spine AS (SELECT user_id,
                      unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
                    FROM b),
          j AS (SELECT s.user_id, s.hour,
                  coalesce(h.n, 0) AS n_events, h.vmax
                FROM spine s LEFT JOIN hourly h
                  ON h.user_id = s.user_id AND h.hour = s.hour)
          SELECT user_id, hour, CAST(n_events AS BIGINT) AS n_events,
            last_value(vmax IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY hour
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
          FROM j""",

    "q_global_ids" ->
      """SELECT doc_id, n_chars,
            CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS gid
         FROM documents""",

    // INTEGER, matching Spark's row_number type (the rewrite rule
    // preserves the original output type)
    "q_rownum_sql" ->
      """SELECT doc_id, n_chars,
            CAST(row_number() OVER (ORDER BY doc_id) AS INTEGER) AS gid
         FROM documents""",

    // strict prefix-max formulation of NOT EXISTS (a.p > b.p AND
    // a.d > b.d): dominator max-date over strictly higher prices
    "q_skyline" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice, o_orderdate FROM orders),
          g AS (SELECT o_totalprice AS p, max(o_orderdate) AS md
                FROM t GROUP BY 1),
          r AS (SELECT p, max(md) OVER (ORDER BY p DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dm
                FROM g)
          SELECT t.o_orderkey, t.o_totalprice, t.o_orderdate
          FROM t JOIN r ON t.o_totalprice = r.p
          WHERE dm IS NULL OR dm <= t.o_orderdate""",

    // native NTILE twin — the remainder-first bucket-size law is the
    // same arithmetic the distributed form computes
    "q_ntile_global" ->
      """SELECT o_orderkey, o_totalprice,
            CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS gid,
            CAST(ntile(7) OVER (ORDER BY o_orderkey) AS BIGINT) AS tile
         FROM orders""",

    // same hash buckets, same exact per-bucket sums, same positional
    // median over the sorted bucket means
    "q_median_means" -> {
      val A = graft.ops.Sampling.HashA
      val P = graft.ops.Sampling.HashP
      s"""WITH t AS (SELECT o_orderstatus AS g,
              ((o_orderkey * $A) % $P) % 16 AS b,
              CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS v
            FROM orders),
          bkt AS (SELECT g, b, count(*) AS n, sum(v) AS sv FROM t GROUP BY 1, 2),
          m AS (SELECT g, b,
                  CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS m
                FROM bkt),
          a AS (SELECT g, list(m ORDER BY m) AS ms FROM m GROUP BY g)
          SELECT g AS o_orderstatus,
            ms[CAST((len(ms) + 1) // 2 AS INTEGER)] AS median_of_means,
            CAST(len(ms) AS BIGINT) AS n_buckets
          FROM a"""
    },

    // the incremental invariant, proven by recomputing from scratch
    "q_incr_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT))
              AS BIGINT) AS sum_cents,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT))
              AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS mean_value
         FROM events GROUP BY user_id""",

    // base ∪ changes, highest (ts, event_id) wins, winning delete
    // drops the key — (ts, event_id) is unique across the union, so
    // the struct-argmax and the window agree exactly
    "q_cdc_apply" ->
      """WITH b AS (SELECT user_id, ts, event_id, 'U' AS op,
                      event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts < TIMESTAMP '2024-01-20')
            WHERE rn = 1),
          c AS (SELECT user_id, ts, event_id,
                  CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                  event_type, value
                FROM events WHERE ts >= TIMESTAMP '2024-01-20'),
          u AS (SELECT * FROM b UNION ALL SELECT * FROM c),
          w AS (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn FROM u)
         SELECT user_id, ts, event_id, event_type, value
         FROM w WHERE rn = 1 AND op <> 'D'""",

    // latest-wins twin: row_number over the unique (ts, event_id)
    // version order — the struct-argmax can never disagree
    "q_upsert_latest" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
                event_type AS last_event_type, value AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1""",

    // weighted rank thresholds on the same cumulative distribution,
    // cent-quantized integer weights
    "q_weighted_median" ->
      """WITH d AS (SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cnt
           FROM lineitem GROUP BY 1, 2),
          c AS (SELECT g, v,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n
           FROM d)
         SELECT g AS l_returnflag,
           CAST(min(CASE WHEN cum*2 >= n THEN v END) AS BIGINT) AS wmedian_cents,
           CAST(min(CASE WHEN cum*10 >= n*9 THEN v END) AS BIGINT) AS wp90_cents
         FROM c GROUP BY g""",

    // unrolled 3 synchronous rounds; the packed-long argmax makes the
    // (count desc, label asc) mode a plain max — no arg_min/arg_max
    // tie-break semantics leak
    "q_label_prop" -> {
      val Pack = 2147483648L
      // MATERIALIZED: l_{t-1} is referenced twice per round (count
      // join + carry-over base) — see q_kcore
      def round(t: Int, prev: String): String =
        s"""c$t AS MATERIALIZED (SELECT e.dst AS node, p.lbl, count(*) AS c
              FROM edges e JOIN $prev p ON e.src = p.node GROUP BY 1, 2),
            k$t AS MATERIALIZED (SELECT node,
                max(c*$Pack + (${Pack - 1L} - lbl)) AS k
              FROM c$t GROUP BY node),
            l$t AS MATERIALIZED (SELECT p.node,
                CASE WHEN k IS NULL THEN p.lbl
                     ELSE ${Pack - 1L} - (k % $Pack) END AS lbl
              FROM $prev p LEFT JOIN k$t USING (node))"""
      s"""WITH li AS (SELECT l_suppkey, l_partkey FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '2001-01-01'),
          edges AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM (
              SELECT 2*l_suppkey + 1 AS src, 2*l_partkey AS dst FROM li
              UNION ALL
              SELECT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM li)),
          nodes AS (SELECT DISTINCT src AS node FROM edges
                    UNION SELECT DISTINCT dst FROM edges),
          l0 AS (SELECT node, node AS lbl FROM nodes),
          ${round(1, "l0")},
          ${round(2, "l1")},
          ${round(3, "l2")}
          SELECT node, CAST(lbl AS BIGINT) AS label FROM l3"""
    },

    // same portable (id, b) hash, same pre-multiplied integer CDF
    // thresholds (interpolated from graft.ops.Bootstrap so both
    // engines compare the same literals), same closing division
    "q_bootstrap" -> {
      import graft.ops.Bootstrap._
      val caseW = Thresholds.zipWithIndex
        .map { case (t, k) => s"WHEN y < $t THEN $k" }.mkString(" ")
      s"""WITH r AS (SELECT o_orderkey AS id,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, g.b
            FROM orders
            CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) g),
          h AS (SELECT b, cents,
              (($HashA * ((id*$IdMix + b*$BMix) % $P) + $HashB) % $P) AS x
            FROM r),
          y AS (SELECT b, cents,
              (((x*x % $P) * $HashA2 + $HashB2) % $P) AS y FROM h),
          w AS (SELECT b, cents, CASE $caseW ELSE 8 END AS w FROM y)
          SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
            CAST(sum(w*cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE) / 100.0
              AS mean_value
          FROM w GROUP BY b"""
    },

    // same cent quantization, same DECIMAL(38) exact sums, same
    // fixed-order closing double expression per z-score
    "q_zscore" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2))*100 AS BIGINT) AS qq,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS pq
           FROM lineitem),
          s AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(CAST(qq AS DECIMAL(38,0))) AS DOUBLE) AS sq,
             CAST(sum(CAST(qq*qq AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
             CAST(sum(CAST(pq AS DECIMAL(38,0))) AS DOUBLE) AS sp,
             CAST(sum(CAST(pq*pq AS DECIMAL(38,0))) AS DOUBLE) AS spp
           FROM t GROUP BY 1)
         SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag,
           CASE WHEN (sqq - sq*sq/nd)/nd = 0 THEN NULL
                ELSE (CAST(qq AS DOUBLE) - sq/nd)
                     / sqrt((sqq - sq*sq/nd)/nd) END AS l_quantity_z,
           CASE WHEN (spp - sp*sp/nd)/nd = 0 THEN NULL
                ELSE (CAST(pq AS DOUBLE) - sp/nd)
                     / sqrt((spp - sp*sp/nd)/nd) END AS l_extendedprice_z
         FROM t JOIN s USING (l_returnflag)""",

    // quota twin: rank by the same bijective hash, keep rn <= quota —
    // identical sets because distinct keys cannot collide
    "q_exact_quota" -> {
      val A = graft.ops.Sampling.HashA
      val P = graft.ops.Sampling.HashP
      s"""WITH t AS (SELECT doc_id, lang, n_chars,
              (doc_id * $A) % $P AS h FROM documents),
          r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n FROM t)
          SELECT lang, doc_id, n_chars FROM r WHERE rn <= (n * 3) // 10"""
    },

    // unrolled 3 peels; canonical (least, greatest) undirected edges.
    // Every round CTE is MATERIALIZED: each e_t is referenced three
    // times by round t+1, so inlined CTEs re-expand the whole chain
    // 3^t-fold — enough to OOM DuckDB at round 3 on the full surface
    // run. Joins, not IN-subqueries, for the same reason.
    //
    // q_kcore_conv shares this oracle: the supplier↔part graph
    // converges in ONE peel round at every shipped SF (measured), so
    // the 3-round unroll IS the fixpoint — peeling a stable edge set
    // is a no-op (spec-pinned in ExtOpsSpec "converged peels").
    "q_zorder3" -> zorder3Sql,
    "q_hilbert3" -> hilbert3Sql,
    "q_kcore_conv" -> kcoreSql,
    "q_kcore" -> kcoreSql,
    // q_ktruss_conv likewise shares the 2-round q_ktruss unroll (the
    // ≥2-co-occurrence part graph also converges in one round).
    "q_ktruss_conv" -> ktrussSql,
    "q_ktruss" -> ktrussSql,
    "q_shard_assign" ->
      """SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum,
                CAST((cum - 1) // 100000 AS BIGINT) AS shard
         FROM (SELECT doc_id, n_chars,
                 sum(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM documents)""",

    // same cumdist rank thresholds, same integer clip
    "q_winsorize" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS v
           FROM lineitem),
          d AS (SELECT l_returnflag AS g, v, count(*) AS cnt FROM t GROUP BY 1, 2),
          c AS (SELECT g, v,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n FROM d),
          b AS (SELECT g, min(CASE WHEN cum*20 >= n THEN v END) AS lo,
                  min(CASE WHEN cum*20 >= n*19 THEN v END) AS hi
                FROM c GROUP BY g)
         SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag,
           CAST(greatest(lo, least(hi, v)) AS BIGINT)
             AS l_extendedprice_clipped_cents
         FROM t JOIN b ON t.l_returnflag = b.g""",

    // same two cumdist passes (values, then absolute deviations),
    // same closing double expression
    "q_robust_z" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) AS v
           FROM lineitem),
          d AS (SELECT l_returnflag AS g, v, count(*) AS cnt FROM t GROUP BY 1, 2),
          c AS (SELECT g, v,
             sum(cnt) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n FROM d),
          m AS (SELECT g, min(CASE WHEN cum*2 >= n THEN v END) AS med
                FROM c GROUP BY g),
          t2 AS (SELECT t.l_orderkey, t.l_linenumber, t.l_returnflag, t.v,
                   m.med, abs(t.v - m.med) AS av
                 FROM t JOIN m ON t.l_returnflag = m.g),
          d2 AS (SELECT l_returnflag AS g, av, count(*) AS cnt
                 FROM t2 GROUP BY 1, 2),
          c2 AS (SELECT g, av,
             sum(cnt) OVER (PARTITION BY g ORDER BY av
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n FROM d2),
          m2 AS (SELECT g, min(CASE WHEN cum*2 >= n THEN av END) AS mad
                 FROM c2 GROUP BY g)
         SELECT t2.l_orderkey, t2.l_linenumber, t2.l_returnflag,
           CASE WHEN mad = 0 THEN NULL
                ELSE (CAST(v AS DOUBLE) - CAST(med AS DOUBLE))
                     / (CAST(mad AS DOUBLE) * 1.4826) END
             AS l_extendedprice_robust_z
         FROM t2 JOIN m2 ON t2.l_returnflag = m2.g""",

    "q_dq_checks" ->
      """SELECT 'orders_pk_unique' AS "check",
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
            CAST(count(*) AS BIGINT) AS total,
            count(*) - count(DISTINCT o_orderkey) = 0 AS passed
         FROM orders
         UNION ALL
         SELECT 'lineitem_pk_unique',
            CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
            CAST(count(*) AS BIGINT),
            count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0
         FROM lineitem
         UNION ALL
         SELECT 'lineitem_fk_orders',
            CAST((SELECT count(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
            CAST((SELECT count(*) FROM lineitem) AS BIGINT),
            (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) = 0
         UNION ALL
         SELECT 'orders_custkey_nonnull',
            CAST(count(*) - count(o_custkey) AS BIGINT),
            CAST(count(*) AS BIGINT),
            count(*) - count(o_custkey) = 0
         FROM orders
         UNION ALL
         SELECT 'lineitem_qty_range',
            CAST(sum(CASE WHEN l_quantity IS NULL
                          OR l_quantity < 1.0 OR l_quantity > 50.0
                     THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(*) AS BIGINT),
            sum(CASE WHEN l_quantity IS NULL
                     OR l_quantity < 1.0 OR l_quantity > 50.0
                THEN 1 ELSE 0 END) = 0
         FROM lineitem
         UNION ALL
         SELECT 'orders_status_domain',
            CAST(sum(CASE WHEN o_orderstatus IS NULL
                          OR o_orderstatus NOT IN ('O','F','P')
                     THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(*) AS BIGINT),
            sum(CASE WHEN o_orderstatus IS NULL
                     OR o_orderstatus NOT IN ('O','F','P')
                THEN 1 ELSE 0 END) = 0
         FROM orders""",

    // map pipeline replayed relationally: filter = HAVING, rescale =
    // arithmetic, map_concat's synthetic key = the grouped twin
    "q_map_funcs" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
                    FROM events GROUP BY 1, 2)
         SELECT user_id, event_type AS k, CAST(2*cnt AS BIGINT) AS v
         FROM c WHERE cnt >= 3
         UNION ALL
         SELECT user_id, '_n_types', CAST(count(*) AS BIGINT)
         FROM c GROUP BY user_id""",

    // arg_min/arg_max on a HUGEINT-encoded (ts, event_id) key — the
    // same winner as Spark's lexicographic min(struct(ts, id, v))
    // because epoch_us·10^10 + id is strictly monotone in (ts, id)
    // for id < 10^10. The struct-min formulation was value-identical
    // but allocated ~650 MB in DuckDB for a 600k-row scan (per-row
    // struct materialization); this runs in the scan's own footprint
    // — the checker's peak-memory discipline.
    "q_resample_ohlc" ->
      """SELECT event_type, date_trunc('hour', ts) AS bucket,
            CAST(count(*) AS BIGINT) AS n_events,
            arg_min(value,
              CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id) AS open,
            max(value) AS high, min(value) AS low,
            arg_max(value,
              CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id) AS close,
            CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events GROUP BY 1, 2""",

    "q_lag_delta" ->
      """SELECT user_id, event_id,
            CAST(floor(value*100) AS BIGINT) AS v_cents,
            CAST(floor(value*100) AS BIGINT) -
              lag(CAST(floor(value*100) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
         FROM events""",

    // identical final-expression order as the Spark side: all float
    // arithmetic happens once, on exact integer sums
    "q_autocorr" ->
      """WITH p AS (SELECT event_type AS g,
              CAST(floor(value*100) AS BIGINT) AS x,
              lag(CAST(floor(value*100) AS BIGINT)) OVER (
                PARTITION BY event_type, user_id ORDER BY ts, event_id) AS y
            FROM events),
          f AS (SELECT g, x, y FROM p WHERE y IS NOT NULL),
          s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
              CAST(sum(x*x) AS DOUBLE) AS sxx,
              CAST(sum(y*y) AS DOUBLE) AS syy,
              CAST(sum(x*y) AS DOUBLE) AS sxy
            FROM f GROUP BY g)
          SELECT g AS event_type, n_pairs,
            CASE WHEN n_pairs*sxx - sx*sx = 0.0
                   OR n_pairs*syy - sy*sy = 0.0 THEN 0.0
            ELSE (n_pairs*sxy - sx*sy) /
                 (sqrt(n_pairs*sxx - sx*sx) * sqrt(n_pairs*syy - sy*sy))
            END AS r
          FROM s""",

    "q_ewma" -> {
      val lags = (1 to 7)
        .map(j => s"lag(xq, $j) OVER w AS x$j").mkString(", ")
      def term(j: Int, f: Long => String): String = {
        val x = if (j == 0) "xq" else s"x$j"
        s"CASE WHEN $x IS NULL THEN 0 ELSE ${f(1L << (7 - j))} END"
      }
      val num = (0 to 7)
        .map(j => term(j, w => s"$w*${if (j == 0) "xq" else s"x$j"}"))
        .mkString(" + ")
      val den = (0 to 7).map(j => term(j, w => s"$w")).mkString(" + ")
      s"""WITH b AS (SELECT user_id, event_id,
              CAST(floor(value*100) AS BIGINT) AS xq, $lags
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT user_id, event_id, xq AS v_cents,
            CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE) AS ewma
          FROM b"""
    },

    // raw-moment identities on exact integer power sums; expression
    // text mirrors Moments.momentsByGroup token for token
    "q_moments" ->
      """WITH t AS (SELECT l_returnflag AS g,
              CAST(floor(l_quantity) AS BIGINT) AS x FROM lineitem),
          s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS DOUBLE) AS s1,
              CAST(sum(x*x) AS DOUBLE) AS s2,
              CAST(sum(x*x*x) AS DOUBLE) AS s3,
              CAST(sum(x*x*x*x) AS DOUBLE) AS s4
            FROM t GROUP BY g)
          SELECT g AS l_returnflag, n,
            s1/n AS mean,
            s2/n - (s1/n)*(s1/n) AS variance,
            CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
            ELSE (s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n)) /
                 ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n)))
            END AS skew,
            CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
            ELSE (s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                    - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
                 ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0
            END AS kurt_excess
          FROM s""",

    "q_welch_ttest" ->
      """WITH t AS (SELECT (l_returnflag = 'A') AS a,
              CAST(floor(l_extendedprice*100) AS DECIMAL(18,0)) AS x
            FROM lineitem WHERE l_returnflag IN ('A','N')),
          s AS (SELECT
              CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN a THEN x
                       ELSE CAST(0 AS DECIMAL(18,0)) END) AS DOUBLE) AS sa,
              CAST(sum(CASE WHEN NOT a THEN x
                       ELSE CAST(0 AS DECIMAL(18,0)) END) AS DOUBLE) AS sb,
              CAST(sum(CASE WHEN a THEN x*x
                       ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS saa,
              CAST(sum(CASE WHEN NOT a THEN x*x
                       ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS sbb
            FROM t)
          SELECT n_a, n_b,
            sa/n_a/100.0 AS mean_a,
            sb/n_b/100.0 AS mean_b,
            (sa/n_a - sb/n_b) /
                sqrt((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                     (sbb - sb*sb/n_b)/(n_b - 1)/n_b) AS t_stat,
            ((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                 (sbb - sb*sb/n_b)/(n_b - 1)/n_b) *
                ((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                 (sbb - sb*sb/n_b)/(n_b - 1)/n_b) /
                (((saa - sa*sa/n_a)/(n_a - 1)/n_a) *
                 ((saa - sa*sa/n_a)/(n_a - 1)/n_a) / (n_a - 1) +
                 ((sbb - sb*sb/n_b)/(n_b - 1)/n_b) *
                 ((sbb - sb*sb/n_b)/(n_b - 1)/n_b) / (n_b - 1)) AS df
          FROM s""",

    // doubled average ranks 2*cum - cnt + 1 stay integral; Pearson
    // on ranks from exact DECIMAL sums
    "q_spearman" ->
      """WITH t AS (SELECT l_returnflag AS g,
              CAST(floor(l_quantity) AS BIGINT) AS xv,
              CAST(floor(l_extendedprice*100) AS BIGINT) AS yv
            FROM lineitem),
          cx AS (SELECT g, xv AS v, count(*) AS c FROM t GROUP BY 1, 2),
          rx AS (SELECT g, v, CAST(2*sum(c) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - c + 1 AS DECIMAL(18,0)) AS rx FROM cx),
          cy AS (SELECT g, yv AS v, count(*) AS c FROM t GROUP BY 1, 2),
          ry AS (SELECT g, v, CAST(2*sum(c) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - c + 1 AS DECIMAL(18,0)) AS ry FROM cy),
          r AS (SELECT t.g, rx.rx, ry.ry FROM t
                JOIN rx ON rx.g = t.g AND rx.v = t.xv
                JOIN ry ON ry.g = t.g AND ry.v = t.yv),
          s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
              CAST(sum(rx*rx) AS DOUBLE) AS sxx,
              CAST(sum(ry*ry) AS DOUBLE) AS syy,
              CAST(sum(rx*ry) AS DOUBLE) AS sxy
            FROM r GROUP BY g)
          SELECT g AS l_returnflag, n,
            CASE WHEN n*sxx - sx*sx = 0.0 OR n*syy - sy*sy = 0.0
            THEN 0.0
            ELSE (n*sxy - sx*sy) /
                 (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
            END AS rho
          FROM s""",

    "q_string_agg" ->
      """SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
            string_agg(n_name, ',' ORDER BY n_name) AS nations
          FROM nation JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name""",

    // trailing 7-observed-day baseline; z text shared with BurstZExpr
    "q_burst" -> {
      s"""WITH daily AS (SELECT event_type,
              date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
              count(*) AS cnt
            FROM events GROUP BY 1, 2),
          w AS (SELECT event_type, dn, cnt,
              CASE WHEN count(*) OVER win = 7
                   THEN sum(cnt) OVER win END AS sumw
            FROM daily
            WINDOW win AS (PARTITION BY event_type ORDER BY dn
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
          e AS (SELECT event_type, dn, cnt, sumw,
              7*cnt - sumw AS d7 FROM w)
          SELECT event_type, CAST(dn AS BIGINT) AS day_n, cnt,
            $BurstZExpr AS z,
            CAST(CASE WHEN ($BurstZExpr) > 3.0 THEN 1 ELSE 0 END
              AS BIGINT) AS burst
          FROM e"""
    },

    // exact integer sums per value band; closing divisions only
    "q_calibration" ->
      """SELECT CAST(least(floor(value / 50), 9) AS BIGINT) AS bin,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS n_pos,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS pos_rate,
            CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) /
              CAST(count(*) AS DOUBLE)/100.0 AS mean_value
          FROM events GROUP BY 1""",

    // the IDENTICAL lateral SQL runs on both engines
    "q_lateral_topk" ->
      """SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
          FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""",

    // two unrolled exact power-iteration rounds; share is the one
    // closing double
    "q_hits" ->
      """WITH e AS MATERIALIZED (SELECT DISTINCT user_id AS u,
              event_type AS t FROM events),
          h1 AS (SELECT u, CAST(count(*) AS DECIMAL(18,0)) AS h1
            FROM e GROUP BY u),
          a1 AS (SELECT t, CAST(sum(h1) AS DECIMAL(18,0)) AS a1
            FROM e JOIN h1 USING (u) GROUP BY t),
          h2 AS (SELECT u, CAST(sum(a1) AS DECIMAL(18,0)) AS h2
            FROM e JOIN a1 USING (t) GROUP BY u),
          a2 AS (SELECT t, CAST(sum(h2) AS DECIMAL(28,0)) AS a2
            FROM e JOIN h2 USING (u) GROUP BY t),
          w AS (SELECT t, a1, a2, sum(a2) OVER () AS tot
            FROM a2 JOIN a1 USING (t))
          SELECT t AS authority, CAST(a1 AS BIGINT) AS a1,
            CAST(a2 AS BIGINT) AS a2,
            CAST(a2 AS DOUBLE)/CAST(tot AS DOUBLE) AS share
          FROM w""",

    // distinct-sensitive-value count per quasi bucket
    "q_l_diversity" ->
      """SELECT source, n_chars // 1000 AS len_kb,
            CAST(count(*) AS BIGINT) AS n,
            CAST(count(DISTINCT lang) AS BIGINT) AS l_div,
            CAST(CASE WHEN count(DISTINCT lang) < 3 THEN 1 ELSE 0 END
              AS BIGINT) AS at_risk
          FROM documents GROUP BY 1, 2""",

    // margins/total as windows over the 6-cell frame; mi_part shared
    // with MiPartExpr token for token
    "q_mutual_info" -> {
      s"""WITH cells AS (SELECT l_returnflag, l_linestatus,
              count(*) AS n_xy FROM lineitem GROUP BY 1, 2),
          m AS (SELECT l_returnflag, l_linestatus, n_xy,
              sum(n_xy) OVER (PARTITION BY l_returnflag) AS nx,
              sum(n_xy) OVER (PARTITION BY l_linestatus) AS ny,
              sum(n_xy) OVER () AS n
            FROM cells)
          SELECT l_returnflag, l_linestatus,
            CAST(n_xy AS BIGINT) AS n_xy, $MiPartExpr AS mi_part
          FROM m"""
    },

    // integer detrending (24*cnt - sumw) keeps the seasonal means
    // exact; trend/remainder NULL on incomplete edge windows
    "q_seasonal" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
              count(*) AS cnt FROM events GROUP BY 1),
          w AS (SELECT h, cnt, CAST(hour(h) AS INTEGER) AS hod,
              CASE WHEN count(*) OVER win = 24
                   THEN sum(cnt) OVER win END AS sumw,
              CASE WHEN count(*) OVER win = 24
                   THEN 24*cnt - sum(cnt) OVER win END AS d24
            FROM hourly
            WINDOW win AS (ORDER BY h ROWS BETWEEN 11 PRECEDING
              AND 12 FOLLOWING)),
          se AS (SELECT hod, CAST(sum(d24) AS BIGINT) AS sd,
              count(d24) AS sc FROM w GROUP BY hod)
          SELECT strftime(w.h, '%Y-%m-%d %H:%M:%S') AS hour, cnt,
            CAST(sumw AS DOUBLE)/24.0 AS trend,
            CASE WHEN sc = 0 THEN 0.0
            ELSE CAST(sd AS DOUBLE)/(24.0*CAST(sc AS DOUBLE))
            END AS seasonal,
            CAST(d24 AS DOUBLE)/24.0 -
            CASE WHEN sc = 0 THEN 0.0
            ELSE CAST(sd AS DOUBLE)/(24.0*CAST(sc AS DOUBLE))
            END AS remainder
          FROM w JOIN se ON se.hod = w.hod""",

    // integer day numbers make the lag joins equi-joins; Pearson
    // closing expression shared with SeriesOps.PearsonExpr
    "q_cross_corr" -> {
      s"""WITH daily AS MATERIALIZED (SELECT
              date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS DECIMAL(12,0)) AS ca,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                END) AS DECIMAL(12,0)) AS cb
            FROM events WHERE event_type IN ('purchase','click')
            GROUP BY 1),
          l AS (SELECT unnest(range(0, 8)) AS lag),
          j AS (SELECT l.lag, a.ca, b.cb
            FROM l CROSS JOIN daily a
            JOIN daily b ON b.dn + l.lag = a.dn),
          s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(ca) AS DOUBLE) AS sx,
              CAST(sum(cb) AS DOUBLE) AS sy,
              CAST(sum(ca*ca) AS DOUBLE) AS sxx,
              CAST(sum(cb*cb) AS DOUBLE) AS syy,
              CAST(sum(ca*cb) AS DOUBLE) AS sxy
            FROM j GROUP BY lag)
          SELECT CAST(lag AS BIGINT) AS lag, n_days,
            ${SeriesOps.PearsonExpr} AS r
          FROM s"""
    },

    // the oracle is the O(days × users) brute force the operator
    // avoids: count distinct users per trailing window directly
    "q_sliding_distinct" ->
      """WITH ud AS MATERIALIZED (SELECT DISTINCT
              date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
              user_id FROM events),
          days AS (SELECT DISTINCT dn FROM ud)
          SELECT days.dn AS day_n,
            CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
          FROM days JOIN ud ON ud.dn BETWEEN days.dn - 6 AND days.dn
          GROUP BY 1""",

    // pooled doubled ranks over distinct values; tie term folds as
    // sum c*(cnt^2-1); closing AUC/z expression text shared with
    // StatTests.mannWhitney token for token
    "q_mann_whitney" -> {
      s"""WITH t AS (SELECT (l_returnflag = 'A') AS a,
              CAST(floor(l_quantity) AS BIGINT) AS v
            FROM lineitem WHERE l_returnflag IN ('A','N')),
          cells AS (SELECT a, v, count(*) AS c FROM t GROUP BY 1, 2),
          pooled AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt
            FROM cells GROUP BY v),
          ranks AS (SELECT v, cnt,
              2*sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) - cnt + 1 AS dr
            FROM pooled),
          j AS (SELECT cells.a, CAST(cells.c AS DECIMAL(12,0)) AS c,
              CAST(ranks.dr AS DECIMAL(14,0)) AS dr,
              CAST(ranks.cnt AS DECIMAL(12,0)) AS cnt
            FROM cells JOIN ranks ON ranks.v = cells.v),
          s AS (SELECT
              CAST(sum(CASE WHEN a THEN c
                       ELSE CAST(0 AS DECIMAL(12,0)) END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN NOT a THEN c
                       ELSE CAST(0 AS DECIMAL(12,0)) END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN a THEN c*dr
                       ELSE CAST(0 AS DECIMAL(26,0)) END) AS DOUBLE)
                AS two_ra,
              CAST(sum(c*(cnt*cnt - 1)) AS DOUBLE) AS tie_t
            FROM j)
          SELECT n_a, n_b, ${StatTests.AucExpr} AS auc,
            ${StatTests.MwZExpr} AS z
          FROM s"""
    },

    // identical machinery read as tie-adjusted ROC-AUC of event value
    // separating purchases from clicks
    "q_auc" -> {
      s"""WITH t AS (SELECT (event_type = 'purchase') AS a,
              CAST(floor(value*100) AS BIGINT) AS v
            FROM events WHERE event_type IN ('purchase','click')),
          cells AS (SELECT a, v, count(*) AS c FROM t GROUP BY 1, 2),
          pooled AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt
            FROM cells GROUP BY v),
          ranks AS (SELECT v, cnt,
              2*sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) - cnt + 1 AS dr
            FROM pooled),
          j AS (SELECT cells.a, CAST(cells.c AS DECIMAL(12,0)) AS c,
              CAST(ranks.dr AS DECIMAL(14,0)) AS dr,
              CAST(ranks.cnt AS DECIMAL(12,0)) AS cnt
            FROM cells JOIN ranks ON ranks.v = cells.v),
          s AS (SELECT
              CAST(sum(CASE WHEN a THEN c
                       ELSE CAST(0 AS DECIMAL(12,0)) END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN NOT a THEN c
                       ELSE CAST(0 AS DECIMAL(12,0)) END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN a THEN c*dr
                       ELSE CAST(0 AS DECIMAL(26,0)) END) AS DOUBLE)
                AS two_ra,
              CAST(sum(c*(cnt*cnt - 1)) AS DOUBLE) AS tie_t
            FROM j)
          SELECT n_a, n_b, ${StatTests.AucExpr} AS auc,
            ${StatTests.MwZExpr} AS z
          FROM s"""
    },

    // exact integer D numerator: max |cum_a*n_b - cum_b*n_a|
    "q_ks_test" ->
      """WITH t AS (SELECT (l_returnflag = 'A') AS a,
              CAST(floor(l_extendedprice*100) AS BIGINT) AS v
            FROM lineitem WHERE l_returnflag IN ('A','N')),
          dist AS (SELECT v,
              sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS cb
            FROM t GROUP BY v),
          c AS (SELECT v,
              CAST(sum(ca) OVER w AS DECIMAL(18,0)) AS cuma,
              CAST(sum(cb) OVER w AS DECIMAL(18,0)) AS cumb,
              CAST(sum(ca) OVER () AS DECIMAL(18,0)) AS na,
              CAST(sum(cb) OVER () AS DECIMAL(18,0)) AS nb
            FROM dist
            WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW)),
          s AS (SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              max(abs(cuma*nb - cumb*na)) AS dnum
            FROM c GROUP BY 1, 2)
          SELECT n_a, n_b,
            CAST(dnum AS DOUBLE) /
            (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) AS d,
            CAST(dnum AS DOUBLE) /
            (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) *
            sqrt(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE) /
                 (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) AS ks_stat
          FROM s""",

    // concordant/discordant from contingency-cell pair products
    "q_kendall" ->
      """WITH t AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
              CAST(l_linenumber AS BIGINT) AS y FROM lineitem),
          cells AS MATERIALIZED (SELECT x, y,
              CAST(count(*) AS DECIMAL(14,0)) AS c
            FROM t GROUP BY 1, 2),
          p AS (SELECT
              CAST(sum(CASE WHEN c1.y < c2.y THEN c1.c*c2.c
                       ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE)
                AS conc,
              CAST(sum(CASE WHEN c1.y > c2.y THEN c1.c*c2.c
                       ELSE CAST(0 AS DECIMAL(28,0)) END) AS DOUBLE)
                AS disc
            FROM cells c1 JOIN cells c2
              ON c1.x < c2.x AND c1.y <> c2.y),
          tx AS (SELECT CAST(sum(cx*(cx - 1)) AS DOUBLE) AS tie_x
            FROM (SELECT CAST(sum(c) AS DECIMAL(18,0)) AS cx
                  FROM cells GROUP BY x)),
          ty AS (SELECT CAST(sum(cy*(cy - 1)) AS DOUBLE) AS tie_y
            FROM (SELECT CAST(sum(c) AS DECIMAL(18,0)) AS cy
                  FROM cells GROUP BY y)),
          nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
          SELECT n, CAST(conc AS BIGINT) AS concordant,
            CAST(disc AS BIGINT) AS discordant,
            2.0*(conc - disc) /
            sqrt((CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0) - tie_x)
               * (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0) - tie_y))
              AS tau_b
          FROM p, tx, ty, nn""",

    // tie-adjusted doubled-rank Gini over the distinct-value frame
    "q_gini" ->
      """WITH t AS (SELECT l_returnflag AS g,
              CAST(floor(l_extendedprice*100) AS BIGINT) AS v
            FROM lineitem),
          cd AS (SELECT g, v, count(*) AS cnt FROM t GROUP BY 1, 2),
          r AS (SELECT g, CAST(v AS DECIMAL(10,0)) AS v,
              CAST(cnt AS DECIMAL(12,0)) AS cnt,
              CAST(2*sum(cnt) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - cnt + 1 AS DECIMAL(14,0)) AS dr,
              sum(cnt) OVER (PARTITION BY g) AS n
            FROM cd),
          s AS (SELECT g, CAST(n AS BIGINT) AS n,
              CAST(sum(v*cnt*dr) AS DOUBLE) AS drx,
              CAST(sum(v*cnt) AS DOUBLE) AS sx
            FROM r GROUP BY 1, 2)
          SELECT g AS l_returnflag, n,
            CASE WHEN sx = 0.0 THEN 0.0
            ELSE drx/(CAST(n AS DOUBLE)*sx)
                 - (CAST(n AS DOUBLE) + 1.0)/CAST(n AS DOUBLE)
            END AS gini
          FROM s""",

    // first significant digit via string arithmetic on the floored
    // integer; Benford expectation and chi-square parts closed-form
    "q_benford" ->
      """WITH t AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM orders WHERE o_totalprice >= 1),
          c AS (SELECT digit, count(*) AS n_obs FROM t GROUP BY digit),
          w AS (SELECT digit, n_obs, sum(n_obs) OVER () AS n FROM c)
          SELECT digit, n_obs,
            CAST(n_obs AS DOUBLE)/CAST(n AS DOUBLE) AS share,
            log10(1.0 + 1.0/CAST(digit AS DOUBLE)) AS benford,
            (CAST(n_obs AS DOUBLE)
               - CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))
            *(CAST(n_obs AS DOUBLE)
               - CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))
            /(CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))
              AS chi2_part
          FROM w""",

    // integer floor division keeps the 1/deg weights exact
    "q_node_sim" ->
      """WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t
                    FROM events),
          deg AS (SELECT u, count(*) AS dg FROM e GROUP BY u),
          k AS (SELECT u, 1000000 // dg AS w FROM deg
                WHERE dg BETWEEN 2 AND 256),
          p AS (SELECT e1.t AS a, e2.t AS b, k.w
                FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.t < e2.t
                JOIN k ON k.u = e1.u)
          SELECT a AS node_a, b AS node_b,
            CAST(count(*) AS BIGINT) AS n_common,
            CAST(sum(w) AS BIGINT) AS ra_fp
          FROM p GROUP BY 1, 2""",

    "q_scalar_subquery" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above
         FROM orders
         WHERE CAST(floor(o_totalprice * 100) AS BIGINT) *
               (SELECT count(*) FROM orders) >
               (SELECT sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                FROM orders)
         GROUP BY o_orderpriority""",

    "q_transitions" ->
      """WITH p AS (SELECT event_type AS f,
              lead(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS t
            FROM events),
          c AS (SELECT f, t, CAST(count(*) AS BIGINT) AS cnt
                FROM p WHERE t IS NOT NULL GROUP BY 1, 2),
          w AS (SELECT f, t, cnt, sum(cnt) OVER (PARTITION BY f) AS tot
                FROM c)
          SELECT f AS src, t AS dst, cnt,
            CAST((1000000 * cnt) // tot AS BIGINT) AS p_ppm
          FROM w""",

    // the same conditional struct min/max window — DuckDB's struct
    // ordering matches Spark's field-lexicographic ordering
    "q_attribution" ->
      """WITH a AS (SELECT user_id, ts, event_id, event_type,
            (min(CASE WHEN event_type = 'click'
                 THEN {'t': ts, 'i': event_id} END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ).i AS first_touch,
            (max(CASE WHEN event_type = 'click'
                 THEN {'t': ts, 'i': event_id} END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ).i AS last_touch
          FROM events)
          SELECT user_id, event_id AS conversion_id,
            ts AS conversion_ts, first_touch, last_touch
          FROM a WHERE event_type = 'purchase'""",

    // integer CUSUM: C_k = n*P_k - k*S; argmax via the same
    // (abs, c, k, ord) struct ordering as the Spark aggregation
    "q_cusum" ->
      """WITH b AS (SELECT user_id AS entity, event_id AS ord,
              CAST(floor(value*100) AS BIGINT) AS xq, ts FROM events),
          w AS (SELECT entity, ord,
              sum(xq) OVER (PARTITION BY entity ORDER BY ts, ord
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk,
              row_number() OVER (PARTITION BY entity ORDER BY ts, ord) AS k,
              sum(xq) OVER (PARTITION BY entity) AS s,
              count(*) OVER (PARTITION BY entity) AS n
            FROM b),
          c AS (SELECT entity, ord, CAST(n AS BIGINT) AS n,
              CAST(n*pk - k*s AS BIGINT) AS c, CAST(k AS BIGINT) AS k
            FROM w)
          SELECT entity AS user_id, CAST(max(n) AS BIGINT) AS n,
            (max({'a': abs(c), 'c': c, 'k': k, 'i': ord})).k AS k_star,
            (max({'a': abs(c), 'c': c, 'k': k, 'i': ord})).i AS ord_star,
            (max({'a': abs(c), 'c': c, 'k': k, 'i': ord})).c AS cusum_star,
            (max({'a': abs(c), 'c': c, 'k': k, 'i': ord})).a AS cusum_abs
          FROM c GROUP BY entity""",

    // determinant expression texts interpolated from Regression —
    // token-identical to the Spark selectExpr, so the IEEE evaluation
    // order is identical by construction
    "q_ols2" -> {
      import graft.ops.Regression.{Det2, Det2B0, Det2B1, Det2B2}
      s"""WITH t AS (SELECT l_returnflag AS g,
              CAST(floor(CAST(l_quantity AS DOUBLE) * 100.0) AS BIGINT) AS a,
              CAST(floor(CAST(l_discount AS DOUBLE) * 100.0) AS BIGINT) AS b,
              CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0) AS BIGINT) AS y
            FROM lineitem),
          s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              sum(a) AS sa, sum(b) AS sb, sum(y) AS sy,
              sum(CAST(a AS DECIMAL(18,0))*CAST(a AS DECIMAL(18,0))) AS saa,
              sum(CAST(a AS DECIMAL(18,0))*CAST(b AS DECIMAL(18,0))) AS sab,
              sum(CAST(b AS DECIMAL(18,0))*CAST(b AS DECIMAL(18,0))) AS sbb,
              sum(CAST(a AS DECIMAL(18,0))*CAST(y AS DECIMAL(18,0))) AS say,
              sum(CAST(b AS DECIMAL(18,0))*CAST(y AS DECIMAL(18,0))) AS sby
            FROM t GROUP BY g)
          SELECT g AS l_returnflag, n,
            CASE WHEN ($Det2) = 0.0 THEN 0.0
                 ELSE ($Det2B0) / ($Det2) / 100.0 END AS beta0,
            CASE WHEN ($Det2) = 0.0 THEN 0.0
                 ELSE ($Det2B1) / ($Det2) END AS beta1,
            CASE WHEN ($Det2) = 0.0 THEN 0.0
                 ELSE ($Det2B2) / ($Det2) END AS beta2
          FROM s"""
    },

    "q_assortativity" ->
      """WITH e AS (SELECT DISTINCT l_partkey*2 AS u, l_suppkey*2+1 AS v
                    FROM lineitem),
          sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
          deg AS (SELECT u, CAST(count(*) AS BIGINT) AS du
                  FROM sym GROUP BY u),
          p AS (SELECT CAST(d1.du AS DECIMAL(18,0)) AS x,
                       CAST(d2.du AS DECIMAL(18,0)) AS y
                FROM sym JOIN deg d1 ON d1.u = sym.u
                         JOIN deg d2 ON d2.u = sym.v),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n_ends,
              CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
              CAST(sum(x*x) AS DOUBLE) AS sxx,
              CAST(sum(y*y) AS DOUBLE) AS syy,
              CAST(sum(x*y) AS DOUBLE) AS sxy
            FROM p)
          SELECT n_ends,
            CASE WHEN n_ends*sxx - sx*sx = 0.0
                   OR n_ends*syy - sy*sy = 0.0 THEN 0.0
            ELSE (n_ends*sxy - sx*sy) /
                 (sqrt(n_ends*sxx - sx*sx) * sqrt(n_ends*syy - sy*sy))
            END AS r
          FROM s""",

    // dyadic decay weights via integer shifts; 2^40 = 1099511627776
    "q_decayed" ->
      """WITH t AS (SELECT user_id,
              date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS age
            FROM events),
          w AS (SELECT user_id, CASE WHEN age BETWEEN 0 AND 40
                THEN (CAST(1 AS BIGINT) << (40 - age)) ELSE 0 END AS w
              FROM t)
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(w) AS BIGINT) AS w_sum,
            CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / 1099511627776.0 AS score
          FROM w GROUP BY user_id""",

    // ED1 blocking (q_fuzzy_join's keyed CTE) + the q_dedup_clusters
    // recursive min-label closure, composed — MATERIALIZED so the
    // twice-referenced CTEs don't re-expand
    "q_entity_resolution" ->
      """WITH RECURSIVE keyed AS MATERIALIZED (
           SELECT s_suppkey AS id, s_name AS s,
             unnest(list_distinct(list_prepend(s_name,
               list_transform(range(1, length(s_name) + 1),
                 i -> substr(s_name, 1, i - 1) ||
                      substr(s_name, i + 1, length(s_name)))))) AS k
           FROM supplier WHERE s_name IS NOT NULL),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                    a.s AS s_a, b.s AS s_b
                  FROM keyed a JOIN keyed b USING (k) WHERE a.id < b.id),
         pairs AS MATERIALIZED (
           SELECT id_a, id_b FROM cand WHERE levenshtein(s_a, s_b) <= 1),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(node, root) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
         comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node)
         SELECT s.s_suppkey,
           COALESCE(c.comp, s.s_suppkey) AS cluster_id,
           CAST(s.s_suppkey = COALESCE(c.comp, s.s_suppkey) AS BIGINT)
             AS is_keeper
         FROM supplier s LEFT JOIN comp c ON c.node = s.s_suppkey""",

    "q_shuffle_order" ->
      s"""WITH k AS (SELECT doc_id, $ShuffleKeySql AS sk FROM documents)
          SELECT doc_id,
            CAST(row_number() OVER (ORDER BY sk) AS BIGINT) AS shuffle_rank
          FROM k""",

    // same regex chain; DuckDB needs the explicit 'g' flag where
    // Spark's regexp_replace is global by default
    "q_url_canon" ->
      s"""WITH u AS (SELECT doc_id, $DirtyUrlSql AS url FROM documents),
          c0 AS (SELECT doc_id, url,
                   regexp_replace(url, '#.*', '') AS nf FROM u),
          c1 AS (SELECT doc_id, url, nf,
                   regexp_extract(nf,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*') AS pre FROM c0),
          c2 AS (SELECT doc_id, url,
                   lower(pre) || substr(nf, length(pre) + 1) AS lo FROM c1),
          c3 AS (SELECT doc_id, url,
                   regexp_replace(lo, ':443/', '/') AS np FROM c2),
          c4 AS (SELECT doc_id, url,
                   regexp_replace(np, '&utm_[^&#]*', '', 'g') AS nu FROM c3)
          SELECT doc_id, url,
            regexp_replace(nu, '/$$', '') AS canon_url
          FROM c4""",

    "q_k_anonymity" ->
      """SELECT lang, source, n_chars // 1000 AS len_kb,
            CAST(count(*) AS BIGINT) AS n,
            CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
              AS at_risk
         FROM documents GROUP BY 1, 2, 3""",

    "q_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, $CollidingUrlSql AS url FROM documents),
          c0 AS (SELECT doc_id,
                   regexp_replace(url, '#.*', '') AS nf FROM u),
          c1 AS (SELECT doc_id, nf,
                   regexp_extract(nf,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*') AS pre FROM c0),
          c2 AS (SELECT doc_id,
                   lower(pre) || substr(nf, length(pre) + 1) AS lo FROM c1),
          c3 AS (SELECT doc_id,
                   regexp_replace(lo, ':443/', '/') AS np FROM c2),
          c4 AS (SELECT doc_id,
                   regexp_replace(regexp_replace(np, '&utm_[^&#]*', '', 'g'),
                     '/$$', '') AS canon_url FROM c3)
          SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(min(doc_id) AS BIGINT) AS keeper_id
          FROM c4 GROUP BY canon_url""",

    "q_event_paths" ->
      """WITH r AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn
            FROM events),
          p AS (SELECT user_id,
              string_agg(event_type, '>' ORDER BY rn) AS path,
              count(*) AS n
            FROM r WHERE rn <= 3 GROUP BY user_id),
          c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_entities
                FROM p WHERE n = 3 GROUP BY path)
          SELECT path, n_entities FROM c
          ORDER BY n_entities DESC, path LIMIT 10""",

    "q_window_nth" ->
      """SELECT o_orderstatus, o_orderkey,
           first_value(o_orderkey) OVER w AS first_in_frame,
           nth_value(o_orderkey, 2) OVER w AS second_in_frame,
           last_value(o_orderkey) OVER w AS last_in_frame
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",

    "q_correlated_subquery" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_above
         FROM orders o
         WHERE CAST(floor(o.o_totalprice * 100) AS BIGINT) *
               (SELECT count(*) FROM orders i
                WHERE i.o_orderpriority = o.o_orderpriority) >
               (SELECT sum(CAST(floor(i.o_totalprice * 100) AS BIGINT))
                FROM orders i
                WHERE i.o_orderpriority = o.o_orderpriority)
         GROUP BY o_orderpriority""",

    "q_ab_test" ->
      s"""WITH users AS (SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 5 ELSE 0 END)
                   >= count(*) AS BIGINT) AS conv,
              user_id % 2 AS arm
            FROM events GROUP BY user_id),
          s AS (SELECT
              CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS k0,
              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS k1
            FROM users)
          SELECT n0, k0, n1, k1,
            $AbUpliftExpr AS uplift, $AbZExpr AS z
          FROM s""",

    "q_assoc_rules" ->
      """WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t
                    FROM events),
          ct AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY t),
          total AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS users FROM e),
          p AS (SELECT e1.t AS a, e2.t AS b,
                  CAST(count(*) AS BIGINT) AS support
                FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.t < e2.t
                GROUP BY 1, 2)
          SELECT a, b, support, ca.c AS ca, cb.c AS cb, users,
            (1000000 * support) // ca.c AS conf_a_b_ppm,
            (1000000 * support) // cb.c AS conf_b_a_ppm,
            (1000000 * support * users) // (ca.c * cb.c) AS lift_ppm
          FROM p
          JOIN ct ca ON ca.t = p.a
          JOIN ct cb ON cb.t = p.b
          CROSS JOIN total"""
  )
}
