package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator pack, mirroring the reference's operator
  * inventory (SURVEY.md §2) over the harness testdata tables.
  *
  * Each query has a DuckDB-oracle twin in [[CoreQueries.oracleSql]];
  * column names/types are aligned on both sides because the driver
  * compare hashes values after sorting columns by name.
  *
  * Determinism rules used throughout (see SURVEY.md §7.5 O3):
  *  - double aggregation goes through exact DECIMAL arithmetic and is
  *    cast back to double at the end (FP sum order would otherwise
  *    differ between engines);
  *  - timestamps are emitted as formatted strings (parquet µs vs
  *    DuckDB ns precision would otherwise hash-differ);
  *  - integer outputs are cast to long (DuckDB defaults to BIGINT);
  *  - ranked/limited outputs always break ties on a unique key.
  *
  * Scale notes (100 TB): every query here is a single scan with
  * map-side partial aggregation, a broadcast join, or a shuffle on a
  * high-cardinality key — no driver-side collection, no cross joins,
  * no per-row JVM closures (all whole-stage-codegen built-ins).
  */
object CoreQueries {

  /** Exact sum of a 2-decimal double column, returned as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/§2.4 — grouped aggregation with exact decimal sums (TPC-H Q1
    // flavor). Map-side combine makes this scan-dominated at scale.
    "q_agg_lineitem" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P5/P7 — projection + rename + literal column + filter; the
    // filter and column pruning push down to the parquet scan.
    "q_filter_project" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 50000.0)
        .select(
          col("o_orderkey").as("order_id"),
          col("o_custkey").as("cust_id"),
          col("o_totalprice").as("total_price"),
          col("o_orderpriority").as("priority"),
          lit("graft").as("engine"))
    }),

    // P2 — the reference's bug-id chain shape: regexp_extract_all →
    // array filter with numeric guard → first survivor → long
    // (reference main.py:449-454). The cast is guarded the same way
    // as GithubTransform.digitsToLong: a digit run too long for int64
    // clamps to Long.MaxValue instead of throwing under ANSI mode.
    "q_regex_extract" -> ((s, d) => {
      // Two nested transforms keep the regex to ONE evaluation per
      // element: inside a higher-order lambda there is no projection
      // boundary, so a `val stripped = regexp_replace(...)` referenced
      // three times is evaluated three times. Materializing the
      // stripped runs as an array first makes the numeric guard read a
      // lambda variable, not a regex subtree.
      val stripped = transform(
        regexp_extract_all(col("props"), lit("(\\d+)"), lit(1)),
        x => regexp_replace(x, "^0+", ""))
      val values = transform(stripped, x =>
        when(length(x) === 0, lit(0L))
          .when(length(x) <= 18, x.cast("long"))
          .otherwise(lit(Long.MaxValue)))
      Tables.events(s, d).select(
        col("event_id"),
        try_element_at(filter(values, v => v < 50L), lit(1))
          .as("extracted_id"))
    }),

    // F2/F3 — explode (Generate) + re-aggregation: word counts.
    "q_explode_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // J1 — left outer equi-join with a filtered (small) build side;
    // broadcast hint mirrors the reference's per-PR dict lookup.
    "q_join_left" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(
          col("o_orderkey").as("order_id"),
          col("o_orderstatus").as("status"),
          col("c_name").as("customer_name"))
    }),

    // §2.5 — broadcast equi-join + aggregation (fact × small dim).
    "q_join_agg" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
    }),

    // A1 — conditional min (earliest-approval pattern,
    // main.py:513-518): min over a CASE, null when no match.
    "q_cond_min" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          date_format(
            min(when(col("o_orderstatus") === "F", col("o_orderdate"))),
            "yyyy-MM-dd HH:mm:ss").as("first_f_date"),
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"))
        .withColumnRenamed("o_custkey", "cust_id")
    }),

    // S7 — existence probe as a left-semi join (snapshot_exists,
    // main.py:552-601).
    "q_semi_exists" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))
    }),

    // O1/O2 — global top-k with deterministic tie-break (TakeOrdered
    // physical op: no full sort materialization).
    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
        .select(col("o_orderkey").as("order_id"), col("o_totalprice").as("total_price"))
    }),

    // Per-group top-k WITHOUT a window sort: the bounded TopKRows
    // aggregator reduces every map partition to ≤k entries per group
    // before the exchange, so the shuffle carries O(groups·k) rows
    // where row_number().over(...) ships and sorts the whole fact
    // table. Same result as the window form (the oracle IS the window
    // form) — the difference is purely the physical plan.
    "q_group_topk" -> ((s, d) => {
      val top3 = graft.functions.TopKRows.topK(3, asc = false)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(top3(
          col("l_extendedprice").cast("double"),
          col("l_orderkey"),
          col("l_linenumber").cast("long")).as("tk"))
        .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
          posexplode(col("tk")).as(Seq("i", "e")))
        .select(col("flag"), col("status"),
          (col("i") + 1).cast("long").as("rank"),
          col("e.t1").as("order_id"), col("e.t2").as("line_no"),
          col("e.v").as("price"))
    }),

    // §2.10 — window function (first-3-orders-per-customer).
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey").as("cust_id"), col("o_orderkey").as("order_id"), col("rn"))
    }),

    // §2.7 — union-all of two filtered branches (chunk-append shape).
    "q_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      val b = o.filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
      a.unionByName(b)
        .select(col("o_orderkey").as("order_id"), col("o_orderstatus").as("status"))
    }),

    // §2.7 — distinct (hash aggregate, map-side partial).
    "q_distinct" -> ((s, d) => {
      Tables.events(s, d).select(col("user_id"), col("event_type")).distinct()
    }),

    // P4 — character count with null/empty→0 (main.py:530-532).
    "q_charcount" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        coalesce(length(col("text")), lit(0)).cast("long").as("char_count"),
        col("n_chars"))
    }),

    // P3 — array build / transform / distinct / sort / first element
    // (labels-array pattern, main.py:465-469).
    "q_array_ops" -> ((s, d) => {
      val words = filter(split(col("text"), " "), w => w =!= lit(""))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(array_distinct(words)).cast("long").as("n_distinct_words"),
        try_element_at(array_sort(array_distinct(words)), lit(1)).as("first_word"))
    }),

    // Streaming batch-equivalent — event-time tumbling window
    // (hourly) aggregation; the streaming twin lives in
    // graft.streaming with a watermark.
    "q_event_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_filter_project" ->
      """SELECT o_orderkey AS order_id, o_custkey AS cust_id,
         o_totalprice AS total_price, o_orderpriority AS priority,
         'graft' AS engine
         FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 50000.0""",
    "q_regex_extract" ->
      """SELECT event_id,
         CAST(list_extract(list_filter(regexp_extract_all(props, '(\d+)', 1),
              x -> (CASE WHEN length(regexp_replace(x, '^0+', '')) = 0 THEN 0
                         WHEN length(regexp_replace(x, '^0+', '')) <= 18
                           THEN CAST(regexp_replace(x, '^0+', '') AS BIGINT)
                         ELSE 9223372036854775807 END) < 50), 1) AS BIGINT) AS extracted_id
         FROM events""",
    "q_explode_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM
         (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
         WHERE word <> '' GROUP BY word""",
    "q_join_left" ->
      """SELECT o_orderkey AS order_id, o_orderstatus AS status, c_name AS customer_name
         FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
         ON o_custkey = c_custkey""",
    "q_join_agg" ->
      """SELECT p_brand,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
    "q_cond_min" ->
      """SELECT o_custkey AS cust_id,
         strftime(MIN(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END),
           '%Y-%m-%d %H:%M:%S') AS first_f_date,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f
         FROM orders GROUP BY o_custkey""",
    "q_semi_exists" ->
      """SELECT c_custkey AS cust_id, c_name AS name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)""",
    "q_topk" ->
      """SELECT o_orderkey AS order_id, o_totalprice AS total_price
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "q_group_topk" ->
      """SELECT flag, status, rank, order_id, line_no, price FROM (
           SELECT l_returnflag AS flag, l_linestatus AS status,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank,
             l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
             l_extendedprice AS price
           FROM lineitem) t WHERE rank <= 3""",
    "q_window_rank" ->
      """SELECT o_custkey AS cust_id, o_orderkey AS order_id, rn FROM
         (SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders) t WHERE rn <= 3""",
    "q_union" ->
      """SELECT o_orderkey AS order_id, o_orderstatus AS status FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
         UNION ALL
         SELECT o_orderkey AS order_id, o_orderstatus AS status FROM orders
         WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0""",
    "q_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q_charcount" ->
      """SELECT doc_id, CAST(COALESCE(LENGTH(text), 0) AS BIGINT) AS char_count, n_chars
         FROM documents""",
    "q_array_ops" ->
      """SELECT doc_id,
         CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))
           AS BIGINT) AS n_distinct_words,
         list_sort(list_distinct(list_filter(string_split(text, ' '), w -> w <> '')))[1]
           AS first_word
         FROM documents""",
    "q_event_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2"""
  )
}
