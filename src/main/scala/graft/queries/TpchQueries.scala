package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic decision-support queries (TPC-H Q3/Q5/Q10 shapes, adapted
  * to the synthetic schema's columns) — the "a user switching engines
  * runs their existing reports" evidence: multi-way dim/fact joins,
  * a selective date window, exact-money aggregation, deterministic
  * top-N.
  *
  * Money discipline: revenue Σ price·(1−discount) folds in
  * DECIMAL(28,6) (the q_agg_lineitem convention) and the ORDER/LIMIT
  * runs on the EXACT decimal — ties broken by the unique key — so
  * the top-N set is deterministic cross-engine; the double cast
  * happens only in the output projection.
  *
  * Scale shape: nation/region are broadcast (constant-size dims);
  * customer/orders/lineitem/supplier join as shuffled hash joins on
  * their keys with the date/segment/flag filters pushed to the scans
  * (AQE re-plans the post-filter sides; at TPC-H scale all four
  * scale with SF, so forcing a broadcast would be wrong).
  */
object TpchQueries {

  /** Exact revenue fold: Σ price·(1−disc) in DECIMAL(28,6). */
  private def revd(price: Column, disc: Column): Column =
    sum((price.cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - disc.cast("decimal(18,2)")))
      .cast("decimal(28,6)"))

  private val RevTerm =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
       AS DECIMAL(28,6))"""

  private val RevSql = s"SUM($RevTerm)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q1 — pricing summary: the full report (q_agg_lineitem carries
    // the subset): exact decimal sums incl. the three-factor charge
    // price·(1−disc)·(1+tax) with precisions sized so every product
    // stays ≤ 38 digits in BOTH engines; averages close from the
    // exact sums as one double division each.
    "q_tpch_q1" -> ((s, d) => {
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(6,2)")
      val tax = col("l_tax").cast("decimal(6,2)")
      val one = lit(1).cast("decimal(6,2)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).as("sq"),
          sum(price).as("sp"),
          sum((price * (one - disc)).cast("decimal(28,6)")).as("sdp"),
          sum(((price * (one - disc)).cast("decimal(20,4)")
            * (one + tax)).cast("decimal(30,6)")).as("sch"),
          sum(disc).as("sd"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sq").cast("double").as("sum_qty"),
          col("sp").cast("double").as("sum_base_price"),
          col("sdp").cast("double").as("sum_disc_price"),
          col("sch").cast("double").as("sum_charge"),
          expr("CAST(sq AS DOUBLE)/count_order").as("avg_qty"),
          expr("CAST(sp AS DOUBLE)/count_order").as("avg_price"),
          expr("CAST(sd AS DOUBLE)/count_order").as("avg_disc"),
          col("count_order"))
    }),

    // Q6 — forecast revenue change: pure filter + single exact
    // aggregate, the predicate-pushdown showcase (all three
    // predicates reach the scan).
    "q_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz")
          && col("l_discount").cast("decimal(6,2)")
            .between(lit(0.05).cast("decimal(6,2)"),
              lit(0.07).cast("decimal(6,2)"))
          && col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(6,2)"))
            .cast("decimal(28,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))),

    // Q3 — shipping priority: unshipped-at-D revenue of BUILDING
    // customers' orders, top 10 by exact revenue.
    "q_tpch_q3" -> ((s, d) => {
      val D = "2000-01-01"
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(D).cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit(D).cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(revd(col("l_extendedprice"), col("l_discount")).as("revd"))
        .orderBy(col("revd").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("revd").cast("double").as("revenue"),
          to_date(col("o_orderdate")).cast("string").as("o_orderdate"),
          col("o_orderpriority"))
    }),

    // Q5 — local supplier volume: revenue where customer and
    // supplier share an ASIA nation, by nation.
    "q_tpch_q5" -> ((s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("n_nationkey", "n_name")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(revd(col("l_extendedprice"), col("l_discount")).as("revd"))
        .select(col("n_name"), col("revd").cast("double").as("revenue"))
    }),

    // Q7 — volume shipping: bilateral trade between two nations by
    // ship year (supplier nation × customer nation, either
    // direction). The nation pair filter applies to the BROADCAST
    // dim joins; the fact joins stay key-partitioned hash joins.
    "q_tpch_q7" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1"
            && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2"
            && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revd(col("l_extendedprice"), col("l_discount")).as("revd"))
        .select(col("supp_nation"), col("cust_nation"),
          col("l_year").cast("long").as("l_year"),
          col("revd").cast("double").as("revenue"))
    }),

    // Q18 — large-volume orders: orders whose total quantity clears
    // a threshold (HAVING semi-join on an aggregate), with customer
    // detail, top 100 by total price. The qualifying-keys frame is a
    // reduced aggregate (one row per BIG order) — broadcast-joined
    // back, so the fact table shuffles once for the agg and once for
    // the detail join, never sorts globally (TopK via limit).
    "q_tpch_q18" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(
        col("l_orderkey"), floor(col("l_quantity")).cast("long").as("q"))
      val big = l.groupBy("l_orderkey").agg(sum(col("q")).as("sum_qty"))
        .filter(col("sum_qty") > 300L)
      Tables.orders(s, d)
        .join(big, big("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).cast("string").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q2 — minimum-cost supplier (correlated min subquery): with no
    // partsupp table in the synthetic schema, the supply offer for
    // (part, supplier) derives from lineitem as min(l_extendedprice);
    // a supplier wins a part when its offer equals the min over ALL
    // suppliers of the part's region pool (ASIA). The correlated
    // `cost = (SELECT min ...)` becomes a per-part min aggregate
    // joined back on (part, cost) — the decorrelated plan every
    // engine compiles Q2 to. min() is picked, not summed, so doubles
    // stay bit-exact cross-engine. Dims broadcast; the offers frame
    // (one row per part×regional-supplier) is the only shuffled agg.
    "q_tpch_q2" -> ((s, d) => {
      val rn = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, d)
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val offers = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(sup.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val mins = offers.groupBy(col("l_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      offers
        .join(mins, Seq("l_partkey"))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(sup.withColumnRenamed("s_suppkey", "sk")),
          col("l_suppkey") === col("sk"))
        .join(Tables.part(s, d)
          .filter(col("p_type") === "SMALL" && col("p_size") <= 10)
          .select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("cost"))
    }),

    // Q13 — customer order-count distribution: LEFT join so
    // zero-order customers survive into the c_count=0 bucket, then a
    // distribution over the per-customer counts. Two hash aggs; the
    // left join shuffles on custkey (both sides scale with SF — no
    // broadcast).
    "q_tpch_q13" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, d).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q15 — top supplier (max over a view): quarterly revenue per
    // supplier, keep the supplier(s) whose revenue equals the global
    // max. The view is one row per supplier, persisted (two
    // consumers: itself and its 1-row max — without the persist the
    // lineitem scan would run twice), and the max joins back as a
    // 1-row broadcast equi-join on the EXACT decimal, so ties are
    // exact, not double-rounded.
    "q_tpch_q15" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey"))
        .agg(revd(col("l_extendedprice"), col("l_discount")).as("revd"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rev
        .join(broadcast(rev.agg(max(col("revd")).as("mx"))),
          col("revd") === col("mx"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("revd").cast("double").as("total_revenue"))
    }),

    // Q21 — suppliers who kept waiting orders (multi-EXISTS + anti):
    // with no commit/receipt dates in the synthetic schema, "late" =
    // shipped more than 90 days after the order date. For finished
    // ('F') orders: count per supplier the late lineitems where
    // ANOTHER supplier contributed to the order (EXISTS → left-semi
    // on orderkey with a suppkey inequality) but NO OTHER supplier
    // was late (NOT EXISTS → left-anti on the same shape over the
    // late frame). The late frame is persisted: it feeds both the
    // probe side and the anti build side.
    "q_tpch_q21" -> ((s, d) => {
      val late = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate")
          + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val l2 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
      val l3 = late.select(col("l_orderkey").as("k3"),
        col("l_suppkey").as("sk3"))
      late
        .join(l2, col("l_orderkey") === col("k2")
          && col("l_suppkey") =!= col("sk2"), "leftsemi")
        .join(l3, col("l_orderkey") === col("k3")
          && col("l_suppkey") =!= col("sk3"), "leftanti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
        .select(col("s_name"), col("numwait"))
    }),

    // Q22 — global-sales opportunity (anti-join + scalar avg):
    // customers from a nation pool with no order since 2000 whose
    // balance beats the pool's positive-balance average. The average
    // never materializes as a double: balances fold to exact cents
    // (floor(bal·100) — IEEE-identical in both engines) and the
    // comparison cross-multiplies (bal_cents·n > sum_cents), so the
    // scalar subquery is a 1-row broadcast of two integers.
    "q_tpch_q22" -> ((s, d) => {
      val pool = Tables.customer(s, d)
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11))
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val avgc = pool.filter(col("bal_cents") > 0L)
        .agg(sum(col("bal_cents")).as("sum_cents"),
          count(lit(1)).as("n_pos"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        .select(col("o_custkey"))
      pool
        .crossJoin(broadcast(avgc))
        .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
        .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          (sum(col("bal_cents")).cast("double") / 100).as("totacctbal"))
    }),

    // Q4 — order-priority checking: orders in a quarter with at
    // least one late lineitem (EXISTS → left-semi whose condition
    // spans both sides: ship > orderdate + 60 days), counted by
    // priority. The semi join hashes on the order key; the date
    // residual rides the join condition.
    "q_tpch_q4" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      val l = Tables.lineitem(s, d).select(
        col("l_orderkey").as("lk"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("lk")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "leftsemi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q8 — national market share: NATION_5's slice of ASIA-customer
    // STANDARD-part revenue per order year. Both the slice and the
    // total fold as exact decimals (the conditional arm contributes
    // an exact 0), so the closing share is ONE double division.
    "q_tpch_q8" -> ((s, d) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val cn = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("ck"))
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "STANDARD")
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("ck"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", rev)
            .otherwise(lit(0).cast("decimal(28,6)"))).as("nr"),
          sum(rev).as("tr"))
        .select(col("o_year"),
          expr("CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE)").as("mkt_share"))
    }),

    // Q9 — product-type profit: revenue minus a retail-price-derived
    // cost (the synthetic schema has no supplycost; cost =
    // qty·retailprice·0.5), per supplier nation and year. Every
    // stage is an explicitly-cast decimal so both engines type the
    // fold identically — no division anywhere.
    "q_tpch_q9" -> ((s, d) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val cost = ((col("l_quantity").cast("decimal(12,2)") *
        col("p_retailprice").cast("decimal(12,2)")).cast("decimal(20,4)") *
        lit(0.5).cast("decimal(2,1)")).cast("decimal(28,6)")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(rev - cost).cast("double").as("sum_profit"))
    }),

    // Q11 — important stock: per-part supply value from one region's
    // suppliers, kept when the part's value clears a fixed fraction
    // of the regional total. Value folds as exact cent-products
    // (BIGINT), the threshold is an integer cross-multiply against
    // the broadcast 1-row total — no double ever compares.
    "q_tpch_q11" -> ((s, d) => {
      val rn = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("n_nationkey").as("nk"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(rn), col("s_nationkey") === col("nk"))
        .select("s_suppkey")
      val v = Tables.lineitem(s, d)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.part(s, d).select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long") *
          floor(col("p_retailprice") * 100).cast("long")).as("val"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = v.agg(sum(col("val")).as("tot"))
      v.crossJoin(broadcast(tot))
        .filter(col("val") * 2000L > col("tot"))
        .select(col("l_partkey").as("p_partkey"),
          (col("val").cast("double") / 10000.0).as("value"))
    }),

    // Q12 — shipping-delay priority split (shipmode stands in as the
    // return flag): per flag, late-shipped 1997 lineitems whose order
    // was URGENT/HIGH vs the rest — the classic CASE-count pivot.
    "q_tpch_q12" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate",
          "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // Q14 — promo revenue share in one month: two exact decimal
    // folds (the PROMO slice and the total), one double division
    // scaled by 100 — the percentage the marketing report wants.
    "q_tpch_q14" -> ((s, d) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1997-07-01").cast("timestamp_ntz"))
        .join(Tables.part(s, d).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(28,6)"))).as("pr"),
          sum(rev).as("tr"))
        .select(expr("100.0 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE)")
          .as("promo_revenue"))
    }),

    // Q16 — supplier-part relationship counts: distinct suppliers
    // per (brand, type, size) over the DISTINCT lineitem links,
    // excluding a supplier blacklist (negative balance stands in for
    // the complaints filter) via an anti join.
    "q_tpch_q16" -> ((s, d) => {
      val links = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bk"))
      links
        .join(broadcast(bad), col("l_suppkey") === col("bk"), "leftanti")
        .join(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1"
            && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q17 — small-quantity-order revenue: lineitems of a brand/size
    // slice whose quantity is under 20% of the part's average. The
    // correlated avg decorrelates to a per-part (Σq, n) aggregate
    // joined back, and the 0.2·avg comparison cross-multiplies in
    // exact cents (10·q·n < 2·Σq) — no double threshold.
    "q_tpch_q17" -> ((s, d) => {
      val pq = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sq"),
          count(lit(1)).as("n"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#3" && col("p_size") < 15)
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(pq, col("l_partkey") === col("pk"))
        .filter(floor(col("l_quantity") * 100).cast("long") * col("n") * 10L
          < col("sq") * 2L)
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
    }),

    // Q19 — disjunctive predicate revenue: three (brand, size,
    // quantity) baskets OR'd together — the filter-pushdown stress
    // shape (the OR of range conjunctions reaches the scan).
    "q_tpch_q19" -> ((s, d) => {
      val q = col("l_quantity")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && q.between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && q.between(10, 20)) ||
          (col("p_brand") === "Brand#5" && col("p_size").between(1, 15)
            && q.between(20, 30)))
        .agg(revd(col("l_extendedprice"), col("l_discount"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Q20 — majority suppliers: AFRICA suppliers who shipped more
    // than half of some SMALL part's 1997 volume (the partsupp-less
    // adaptation of "excess stock"). The correlated half-sum is a
    // per-part total joined back; the comparison is an exact-cents
    // integer cross-multiply; the supplier list dedups via the
    // grouped flag frame.
    "q_tpch_q20" -> ((s, d) => {
      val sq = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("q"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = sq.groupBy(col("pk")).agg(sum(col("q")).as("tq"))
      val rn = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AFRICA")
        .select(col("n_nationkey").as("nk"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(rn), col("s_nationkey") === col("nk"))
        .select(col("s_suppkey"), col("s_name"))
      sq.join(tot, Seq("pk"))
        .filter(col("q") * 2L > col("tq"))
        .join(Tables.part(s, d).filter(col("p_type") === "SMALL")
          .select("p_partkey"), col("pk") === col("p_partkey"))
        .join(broadcast(sup), col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name")).distinct()
    }),

    // Q10 — returned-item reporting: per-customer lost revenue from
    // 'R' lineitems in a quarter, top 20 by exact revenue.
    "q_tpch_q10" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(revd(col("l_extendedprice"), col("l_discount")).as("revd"))
        .orderBy(col("revd").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("revd").cast("double").as("revenue"),
          col("c_acctbal"), col("n_name"))
    }))

  val oracleSql: Map[String, String] = Map(

    "q_tpch_q1" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
              sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
              sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
              sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(6,2))
                   - CAST(l_discount AS DECIMAL(6,2)))
                AS DECIMAL(28,6))) AS sdp,
              sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(6,2))
                     - CAST(l_discount AS DECIMAL(6,2)))
                  AS DECIMAL(20,4))
                * (CAST(1 AS DECIMAL(6,2))
                   + CAST(l_tax AS DECIMAL(6,2)))
                AS DECIMAL(30,6))) AS sch,
              sum(CAST(l_discount AS DECIMAL(6,2))) AS sd,
              CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-01'
            GROUP BY 1, 2)
          SELECT l_returnflag, l_linestatus,
            CAST(sq AS DOUBLE) AS sum_qty,
            CAST(sp AS DOUBLE) AS sum_base_price,
            CAST(sdp AS DOUBLE) AS sum_disc_price,
            CAST(sch AS DOUBLE) AS sum_charge,
            CAST(sq AS DOUBLE)/count_order AS avg_qty,
            CAST(sp AS DOUBLE)/count_order AS avg_price,
            CAST(sd AS DOUBLE)/count_order AS avg_disc,
            count_order
          FROM a""",

    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(6,2)) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
          CAST(count(*) AS BIGINT) AS n_rows
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND CAST(l_discount AS DECIMAL(6,2))
              BETWEEN CAST(0.05 AS DECIMAL(6,2))
                  AND CAST(0.07 AS DECIMAL(6,2))
            AND l_quantity < 24""",

    "q_tpch_q3" ->
      s"""WITH agg AS (SELECT l_orderkey, o_orderdate, o_orderpriority,
              $RevSql AS revd
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '2000-01-01'
              AND l_shipdate > TIMESTAMP '2000-01-01'
            GROUP BY 1, 2, 3
            ORDER BY revd DESC, l_orderkey LIMIT 10)
          SELECT l_orderkey, CAST(revd AS DOUBLE) AS revenue,
            CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
            o_orderpriority
          FROM agg""",

    "q_tpch_q5" ->
      s"""SELECT n_name, CAST($RevSql AS DOUBLE) AS revenue
          FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
            AND c.c_nationkey = s.s_nationkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name""",

    "q_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS BIGINT) AS l_year,
            CAST($RevSql AS DOUBLE) AS revenue
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          GROUP BY 1, 2, 3""",

    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
              CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                AS sum_qty
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300)
          SELECT c_name, c_custkey, o_orderkey,
            CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
            o_totalprice, sum_qty
          FROM orders o
          JOIN big ON big.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q_tpch_q2" ->
      """WITH sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r_name = 'ASIA'),
          offers AS (SELECT l_partkey, l_suppkey,
              min(l_extendedprice) AS cost
            FROM lineitem l JOIN sup ON l.l_suppkey = sup.s_suppkey
            GROUP BY 1, 2),
          mins AS (SELECT l_partkey, min(cost) AS min_cost
            FROM offers GROUP BY 1)
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
          FROM offers o
          JOIN mins m ON o.l_partkey = m.l_partkey
            AND o.cost = m.min_cost
          JOIN sup ON o.l_suppkey = sup.s_suppkey
          JOIN part p ON o.l_partkey = p.p_partkey
          WHERE p_type = 'SMALL' AND p_size <= 10
          ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          LIMIT 100""",

    "q_tpch_q13" ->
      """WITH percust AS (SELECT c_custkey,
              CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1)
          SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
          FROM percust GROUP BY 1""",

    "q_tpch_q15" ->
      s"""WITH rev AS (SELECT l_suppkey, $RevSql AS revd
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY 1)
          SELECT s_suppkey, s_name, CAST(revd AS DOUBLE) AS total_revenue
          FROM rev JOIN supplier ON l_suppkey = s_suppkey
          WHERE revd = (SELECT max(revd) FROM rev)""",

    "q_tpch_q21" ->
      """WITH late AS (SELECT l_orderkey, l_suppkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
          SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          FROM late l1
          JOIN supplier s ON l1.l_suppkey = s.s_suppkey
          WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM late l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey)
          GROUP BY s_name
          ORDER BY numwait DESC, s_name
          LIMIT 100""",

    "q_tpch_q22" ->
      """WITH pool AS (SELECT c_custkey, c_nationkey,
              CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)),
          avgc AS (SELECT sum(bal_cents) AS sum_cents,
              CAST(count(*) AS BIGINT) AS n_pos
            FROM pool WHERE bal_cents > 0)
          SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
            CAST(count(*) AS BIGINT) AS numcust,
            CAST(sum(bal_cents) AS DOUBLE) / 100 AS totacctbal
          FROM pool, avgc
          WHERE bal_cents * n_pos > sum_cents
            AND NOT EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = pool.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01')
          GROUP BY 1""",

    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
          FROM orders o
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
            AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
          GROUP BY 1""",

    "q_tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN $RevTerm
                          ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) /
            CAST(sum($RevTerm) AS DOUBLE) AS mkt_share
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn ON c.c_nationkey = cn.n_nationkey
          JOIN region r ON cn.n_regionkey = r.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation sn ON s.s_nationkey = sn.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          GROUP BY 1""",

    "q_tpch_q9" ->
      s"""SELECT n_name AS nation,
            CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(sum($RevTerm -
              CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) *
                CAST(p_retailprice AS DECIMAL(12,2)) AS DECIMAL(20,4)) *
                CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(28,6)))
              AS DOUBLE) AS sum_profit
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE p_type = 'ECONOMY'
          GROUP BY 1, 2""",

    "q_tpch_q11" ->
      """WITH rs AS (SELECT s_suppkey FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r_name = 'EUROPE'),
          v AS MATERIALIZED (SELECT l_partkey,
              sum(CAST(floor(l_quantity*100) AS BIGINT) *
                  CAST(floor(p_retailprice*100) AS BIGINT)) AS val
            FROM lineitem l
            JOIN rs ON l.l_suppkey = rs.s_suppkey
            JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1)
          SELECT l_partkey AS p_partkey,
            CAST(val AS DOUBLE) / 10000.0 AS value
          FROM v, (SELECT sum(val) AS tot FROM v) t
          WHERE val * 2000 > tot""",

    "q_tpch_q12" ->
      """SELECT l_returnflag,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          GROUP BY 1""",

    "q_tpch_q14" ->
      s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $RevTerm
              ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) /
            CAST(sum($RevTerm) AS DOUBLE) AS promo_revenue
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-06-01'
            AND l_shipdate < TIMESTAMP '1997-07-01'""",

    "q_tpch_q16" ->
      """WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
          SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
            CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          FROM links JOIN part ON l_partkey = p_partkey
          WHERE p_brand <> 'Brand#1'
            AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
            AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          GROUP BY 1, 2, 3""",

    "q_tpch_q17" ->
      """WITH pq AS (SELECT l_partkey AS pk,
              sum(CAST(floor(l_quantity*100) AS BIGINT)) AS sq,
              CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1)
          SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DOUBLE) / 7.0 AS avg_yearly
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN pq ON pk = l.l_partkey
          WHERE p_brand = 'Brand#3' AND p_size < 15
            AND CAST(floor(l_quantity*100) AS BIGINT) * n * 10 < sq * 2""",

    "q_tpch_q19" ->
      s"""SELECT CAST($RevSql AS DOUBLE) AS revenue,
            CAST(count(*) AS BIGINT) AS n_rows
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
             OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 20 AND 30)""",

    "q_tpch_q20" ->
      """WITH sq AS MATERIALIZED (SELECT l_partkey AS pk, l_suppkey AS sk,
              sum(CAST(floor(l_quantity*100) AS BIGINT)) AS q
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2),
          tot AS (SELECT pk, sum(q) AS tq FROM sq GROUP BY 1)
          SELECT DISTINCT s.s_suppkey, s.s_name
          FROM sq JOIN tot USING (pk)
          JOIN part p ON pk = p.p_partkey
          JOIN supplier s ON sk = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE q * 2 > tq AND p_type = 'SMALL' AND r_name = 'AFRICA'""",

    "q_tpch_q10" ->
      s"""WITH agg AS (SELECT c_custkey, c_name, c_acctbal, n_name,
              $RevSql AS revd
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1997-04-01'
              AND l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revd DESC, c_custkey LIMIT 20)
          SELECT c_custkey, c_name, CAST(revd AS DOUBLE) AS revenue,
            c_acctbal, n_name
          FROM agg""")
}
