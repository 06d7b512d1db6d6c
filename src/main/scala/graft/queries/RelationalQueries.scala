package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The declared relational query surface (SURVEY §2b): scans, projection,
  * filters, all join types, hash aggregation, windows, sorts/top-k, set ops,
  * scalar functions, rollup/cube, subqueries — each with a DuckDB oracle.
  *
  * Scale notes (100 TB discipline): dimension tables (region/nation/customer/
  * supplier/part) are broadcast explicitly; fact-fact joins shuffle on their
  * join key only after filters are pushed to the scan; aggregations are
  * partial-agg friendly (plain groupBy on low-cardinality keys).
  */
object RelationalQueries {
  import Qutil._

  private def q(name: String, sql: String)(f: (SparkSession, String) => DataFrame) =
    Q(name, f, Some(sql))

  val defs: Seq[Q] = Seq(
    // --- aggregation: TPC-H Q1 pricing summary -------------------------------
    q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))*(1+CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      val price = money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        sum(price).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) + rate(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
    },

    // --- filter predicates: comparison, BETWEEN, IN, LIKE, IS NOT NULL -------
    q("q02_filter_pred",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_size BETWEEN 10 AND 40 AND p_type IN ('ECONOMY','PROMO')
        |  AND p_name LIKE '%bolt%' AND p_retailprice IS NOT NULL""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size").between(10, 40)
          && col("p_type").isin("ECONOMY", "PROMO")
          && col("p_name").like("%bolt%")
          && col("p_retailprice").isNotNull)
        .select("p_partkey", "p_name", "p_retailprice")
    },

    // --- 3-way join + agg: TPC-H Q3 shipping priority -------------------------
    q("q03_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin) { (s, d) =>
      // customer is a dim → broadcast; orders⋈lineitem shuffles on orderkey.
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00")))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1999-01-01 00:00:00")))
      // no broadcast hint on customer: it SCALES with SF (15M rows at
      // sf100) — AQE broadcasts it when its measured size allows, and
      // falls back to a shuffled join when it doesn't; a forced hint would
      // override that check
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("orderdate"), col("o_orderpriority"))
    },

    // --- semi join (EXISTS): TPC-H Q4 order priority check --------------------
    q("q04_order_priority",
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(l, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // --- 6-way star join: TPC-H Q5 local supplier volume ----------------------
    q("q05_local_supplier_volume",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*(1-CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      // lineitem is the only big fact. Explicit broadcast hints ONLY on the
      // FIXED-size tables (nation=25, region=5 rows at any SF); customer and
      // supplier scale with SF (15M / 1M rows at sf100), so AQE decides for
      // them from measured sizes — small scale: same broadcast plan; large
      // scale: shuffled join instead of an OOM.
      val asia = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(sup,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"))
    },

    // --- scan-heavy filter + global agg: TPC-H Q6 -----------------------------
    q("q06_revenue_change",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
          && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // --- left outer join + agg over nullable side -----------------------------
    q("q07_cust_order_stats",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))), lit(0))
            .cast("double").as("total_spend"))
    },

    // --- anti join (NOT EXISTS) ----------------------------------------------
    q("q08_cust_no_recent_orders",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin) { (s, d) =>
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      Tables.customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // --- full outer join ------------------------------------------------------
    q("q09_nation_presence",
      """WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c.k, s.k) AS nationkey, c.n_cust, s.n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          col("n_cust"), col("n_supp"))
    },

    // --- cross join + theta filter -------------------------------------------
    q("q10_region_pairs",
      """SELECT r1.r_regionkey AS a, r2.r_regionkey AS b
        |FROM region r1 CROSS JOIN region r2
        |WHERE r1.r_regionkey < r2.r_regionkey""".stripMargin) { (s, d) =>
      val r1 = Tables.region(s, d).select(col("r_regionkey").as("a"))
      val r2 = Tables.region(s, d).select(col("r_regionkey").as("b"))
      r1.crossJoin(r2).filter(col("a") < col("b"))
    },

    // --- window: row_number / rank / dense_rank, top-N per group --------------
    q("q11_top_orders_per_cust",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS rk,
        |    CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INT) AS drk
        |  FROM orders) t WHERE rn <= 3""".stripMargin) { (s, d) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val rankW = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byPrice).as("rn"),
          rank().over(rankW).as("rk"),
          dense_rank().over(rankW).as("drk"))
        .filter(col("rn") <= 3)
    },

    // --- window: lag / lead ---------------------------------------------------
    q("q12_event_neighbors",
      """SELECT event_id, user_id, value,
        |  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |FROM events""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
    },

    // --- window: running (framed) aggregate -----------------------------------
    q("q13_running_spend",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
        |FROM events""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("running_value"),
        count(lit(1)).over(w).as("n_so_far"))
    },

    // --- global sort + limit (top-k → TakeOrderedAndProject) ------------------
    q("q14_top_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },

    // --- set ops: INTERSECT / EXCEPT / UNION ALL ------------------------------
    q("q15_nation_setops",
      """WITH cn AS (SELECT DISTINCT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey),
        |     sn AS (SELECT DISTINCT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey)
        |SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn) t
        |UNION ALL
        |SELECT 'cust_only' AS tag, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn) t""".stripMargin) { (s, d) =>
      val n = Tables.nation(s, d)
      val cn = n.join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
      val sn = n.join(Tables.supplier(s, d), col("s_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
      cn.intersect(sn).withColumn("tag", lit("both"))
        .unionByName(cn.except(sn).withColumn("tag", lit("cust_only")))
        .select("tag", "n_name")
    },

    // --- distinct aggregation -------------------------------------------------
    q("q16_distinct_counts",
      """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
        |       COUNT(DISTINCT o_orderstatus) AS n_status,
        |       (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey, o_orderstatus FROM orders) t) AS n_pairs
        |FROM orders""".stripMargin) { (s, d) =>
      // Deliberately the built-in multi-distinct aggregate (this query IS the
      // §2b multi-count-distinct surface exemplar). Catalyst plans it via
      // Expand ×(n_distincts+1) — fine on a dimension-sized table like
      // orders, a scale-killer on a fact table: for that case use the
      // exploded-pair dedup shape of q27 (measured 33× there).
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(col("o_custkey"), col("o_orderstatus")).as("n_pairs"))
    },

    // --- scalar date functions ------------------------------------------------
    q("q17_orders_by_month",
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
    },

    // --- scalar string functions ----------------------------------------------
    q("q18_string_fns",
      """SELECT p_partkey, UPPER(p_name) AS uname, SUBSTR(p_name, 1, 3) AS pre,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  REPLACE(p_type, 'ECONOMY', 'ECO') AS typ,
        |  CONCAT(p_brand, ':', p_name) AS brand_name,
        |  TRIM(p_name) AS trimmed, LOWER(p_brand) AS lbrand
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 3).as("pre"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), "ECONOMY", "ECO").as("typ"),
        concat(col("p_brand"), lit(":"), col("p_name")).as("brand_name"),
        trim(col("p_name")).as("trimmed"),
        lower(col("p_brand")).as("lbrand"))
    },

    // --- CASE WHEN bucketing --------------------------------------------------
    q("q19_price_buckets",
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
        |            WHEN o_totalprice < 5000 THEN 'mid'
        |            ELSE 'big' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_p,
        |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_p
        |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(when(col("o_totalprice") < 1000, "small")
          .when(col("o_totalprice") < 5000, "mid")
          .otherwise("big").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_p"),
          max(col("o_totalprice")).as("max_p"))
    },

    // --- ROLLUP ---------------------------------------------------------------
    q("q20_rollup_status",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
    },

    // --- CUBE -----------------------------------------------------------------
    q("q21_cube_status_year",
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS y, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, CAST(year(o_orderdate) AS INT))""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"))
    },

    // --- HAVING ---------------------------------------------------------------
    q("q22_hot_parts",
      """SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_dec"))
        .filter(col("qty_dec") > 300)
        .select(col("l_partkey"), col("qty_dec").cast("double").as("qty"))
    },

    // --- scalar subquery ------------------------------------------------------
    q("q23_above_avg_balance",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |                   FROM customer)""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val avgBal = c.agg(davg(col("c_acctbal"), 2).as("avg_bal"))
      c.join(broadcast(avgBal)).filter(col("c_acctbal") > col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    },

    // --- IN subquery (semi join on derived set) -------------------------------
    q("q24_parts_big_orders",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
        .select(col("l_partkey"))
      Tables.part(s, d)
        .join(big, col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
    },

    // --- grouping sets --------------------------------------------------------
    q("q25_grouping_sets",
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      c.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .select(col("c_mktsegment"), lit(null).cast("int").as("c_nationkey"), col("n"))
        .unionByName(
          c.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
            .select(lit(null).cast("string").as("c_mktsegment"), col("c_nationkey"), col("n")))
    },

    // --- approximate distinct (HLL sketch) — hash-green via the verdict-as-
    // --- data shape: HLL estimates are engine-specific (no value oracle is
    // --- possible for them), so the gate emits per-probe rows
    // --- (probe, exact_n, ok) where exact_n IS oracle-able (COUNT DISTINCT)
    // --- and ok is the in-plan 3·rsd bound check. The DuckDB oracle
    // --- restates exact_n and literal TRUE — rows/schema/hash match iff
    // --- the exact counts agree AND every sketch estimate is in bounds. ----
    Q("q27_approx_distinct", (s, d) => {
      def withinBounds(approx: Column, exact: Column, rsd: Double): Column =
        abs(approx.cast("double") - exact.cast("double")) <=
          lit(3 * rsd) * exact.cast("double")
      // ONE scan, ONE shuffle, for sketches AND exact counts: each row
      // explodes into two narrow (tag, value) pairs; map-side partial dedup
      // combines before the shuffle, so shuffle volume is
      // O(distinct_parts + distinct_orders); the final agg computes the
      // exact counts as conditional sums and the HLL sketches over the SAME
      // deduped pairs — sound because an HLL estimate depends only on the
      // distinct value set, never on multiplicity. This is NOT the Catalyst
      // multi-distinct Expand (which multiplies FULL rows ×(n+1) and
      // shuffles the multiple — measured 0.27 s → 9 s at sf0.1): the explode
      // carries 2 columns, not the whole row. And the previous
      // approx-crossJoin-exact recombination of 1-row subplans cost ~2×
      // the data work in plan/codegen overhead alone — one linear
      // aggregation plan is both the scale shape and the fast local one.
      val li = Tables.lineitem(s, d)
      li.select(explode(array(
          struct(lit("p").as("tag"), col("l_partkey").cast("long").as("v")),
          struct(lit("o").as("tag"), col("l_orderkey").cast("long").as("v")))).as("tv"))
        .select(col("tv.tag").as("tag"), col("tv.v").as("v"))
        .distinct()
        .agg(
          approx_count_distinct(when(col("tag") === "p", col("v"))).as("approx_parts"),
          approx_count_distinct(when(col("tag") === "o", col("v")), rsd = 0.01)
            .as("approx_orders_1pct"),
          sum(when(col("tag") === "p", 1L).otherwise(0L)).as("exact_parts"),
          sum(when(col("tag") === "o", 1L).otherwise(0L)).as("exact_orders"))
        .withColumn("parts_within_3rsd",
          withinBounds(col("approx_parts"), col("exact_parts"), 0.05))
        .withColumn("orders_within_3rsd",
          withinBounds(col("approx_orders_1pct"), col("exact_orders"), 0.01))
        // verdict-as-data: one row per probe, (probe, exact_n, ok); the
        // sketch estimates stay internal (engine-specific values)
        .select(explode(array(
          struct(lit("parts").as("probe"), col("exact_parts").as("exact_n"),
            col("parts_within_3rsd").as("ok")),
          struct(lit("orders").as("probe"), col("exact_orders").as("exact_n"),
            col("orders_within_3rsd").as("ok")))).as("r"))
        .select(col("r.probe"), col("r.exact_n"), col("r.ok"))
    }, Some(
      """SELECT 'parts' AS probe, COUNT(DISTINCT l_partkey) AS exact_n, TRUE AS ok FROM lineitem
        |UNION ALL
        |SELECT 'orders' AS probe, COUNT(DISTINCT l_orderkey) AS exact_n, TRUE AS ok FROM lineitem""".stripMargin)),

    // --- approximate percentiles (GK sketch — THE quantile path at 100 TB,
    // --- where exact percentile needs a full sort): q27-style
    // --- self-validation in the same plan, against the sketch's ACTUAL
    // --- guarantee — the RANK of each estimate (count of values ≤ it) must
    // --- land within q·n ± ε·n (sketch rank error 1/accuracy = 0.001, band
    // --- ε = 0.01), else the row is dropped and the driver's rows>0 gate
    // --- fails. Rank validation costs 8 conditional SUMs over one cheap
    // --- second scan — no exact-percentile value map / sort (an earlier
    // --- value-bounds formulation paid 2–4 s in percentile buffers alone).
    // --- Hash-green via verdict-as-data (q27 discipline): sketch internals
    // --- are engine-specific, the rank contract is not — so the contract
    // --- verdict IS the emitted data, matched against literal TRUE. ----------
    Q("q39_approx_percentiles", (s, d) => {
      val qs = Seq(0.25, 0.5, 0.75, 0.99)
      val eps = 0.01
      val x = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      val approx = x.agg(
        percentile_approx(col("x"), array(qs.map(lit): _*), lit(1000)).as("approx"))
      val aggs = (count(lit(1)).as("n") +:
        qs.indices.map(i => sum(when(col("x") <= element_at(col("approx"), i + 1),
          1L).otherwise(0L)).as(s"rank$i"))) :+
        first(col("approx")).as("approx")
      val ranked = x.crossJoin(broadcast(approx))
        .agg(aggs.head, aggs.tail: _*)
      // verdict-as-data (hash-green): one row per quantile, (pq, n, ok) —
      // n is the exact row count (oracle-able), ok the in-plan rank-contract
      // check; estimate values and ranks stay internal (sketch-specific).
      ranked.select(explode(array(qs.indices.map { i =>
          val tag = s"p${(qs(i) * 100).toInt}"
          struct(lit(tag).as("pq"), col("n"),
            (col(s"rank$i") >= (lit(qs(i)) - eps) * col("n") &&
              col(s"rank$i") <= (lit(qs(i)) + eps) * col("n")).as("ok"))
        }: _*)).as("r"))
        .select(col("r.pq"), col("r.n"), col("r.ok"))
    }, Some(Seq(25, 50, 75, 99).map(p =>
      s"SELECT 'p$p' AS pq, COUNT(*) AS n, TRUE AS ok FROM lineitem")
      .mkString("\nUNION ALL\n"))),

    // --- exact percentiles (interpolated; sketch twin is q27-style approx) ----
    q("q30_percentiles",
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5)  AS p50,
        |  quantile_cont(o_totalprice, 0.9)  AS p90
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
    },

    // --- correlated scalar subquery, decorrelated (TPC-H Q17 pattern) ---------
    q("q31_small_qty_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |       COUNT(*) AS n
        |FROM lineitem l1
        |WHERE l_quantity < 0.5 * (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)
        |                          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (s, d) =>
      // manual decorrelation = what Catalyst does to the correlated form:
      // per-part exact average joined back to the fact. NO broadcast hint:
      // avgPerPart has one row PER PARTKEY (cardinality grows with data —
      // 20M rows at sf100), so forcing a broadcast is an executor OOM at
      // scale; both sides already hash-partition on partkey, and AQE may
      // still choose broadcast when the agg is measured small at runtime.
      val li = Tables.lineitem(s, d)
      val avgPerPart = li.groupBy(col("l_partkey").as("p_key"))
        .agg(davg(col("l_quantity"), 2).as("avg_qty"))
      li.join(avgPerPart, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(dsum(col("l_extendedprice"), 2).as("total"), count(lit(1)).as("n"))
    },

    // --- pivot (status × priority order counts) -------------------------------
    q("q28_pivot_status",
      """SELECT o_orderpriority,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P")) // absent combos: pivot yields null
    },

    // --- column profiling (data-quality gate over any table) ------------------
    q("q29_profile_orders",
      """WITH t AS (SELECT COUNT(*) AS n FROM orders)
        |SELECT 'o_orderkey' AS column_name, n AS n_rows,
        |  (SELECT COUNT(o_orderkey) FROM orders) AS non_null,
        |  (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_distinct,
        |  (SELECT CAST(MIN(o_orderkey) AS VARCHAR) FROM orders) AS min_s,
        |  (SELECT CAST(MAX(o_orderkey) AS VARCHAR) FROM orders) AS max_s FROM t
        |UNION ALL
        |SELECT 'o_orderstatus', n,
        |  (SELECT COUNT(o_orderstatus) FROM orders),
        |  (SELECT COUNT(DISTINCT o_orderstatus) FROM orders),
        |  (SELECT MIN(o_orderstatus) FROM orders),
        |  (SELECT MAX(o_orderstatus) FROM orders) FROM t
        |UNION ALL
        |SELECT 'o_custkey', n,
        |  (SELECT COUNT(o_custkey) FROM orders),
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        |  (SELECT CAST(MIN(o_custkey) AS VARCHAR) FROM orders),
        |  (SELECT CAST(MAX(o_custkey) AS VARCHAR) FROM orders) FROM t""".stripMargin) { (s, d) =>
      graft.operators.Profile.describe(Tables.orders(s, d),
        Seq("o_orderkey", "o_orderstatus", "o_custkey"))
    },

    // --- AS-OF join (point-in-time enrichment; DuckDB has it natively, Spark
    // --- gets the union+window re-expression in operators.AsOfJoin) ----------
    q("q32_asof_join",
      """SELECT p.user_id, p.event_id AS purchase_lsn,
        |  u.event_id AS state_lsn, u.value AS state_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') u
        |  ON p.user_id = u.user_id AND u.event_id <= p.event_id""".stripMargin) { (s, d) =>
      // right side = 'view' events: this testdata generation's type set is
      // {signup, view, click, purchase, error} — an earlier 'update' choice
      // matched nothing, making the gate trivially all-null
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"))
      val updates = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.asOf(purchases, updates, Seq("user_id"),
          "event_id", "event_id",
          Map("event_id" -> "state_lsn", "value" -> "state_value"))
        .select(col("user_id"), col("event_id").as("purchase_lsn"),
          col("state_lsn"), col("state_value"))
    },

    // --- range join (point-in-interval; binned equi-join, not nested-loop) ---
    q("q33_range_join",
      """SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem
        |JOIN (VALUES (1, 900.0, 10000.0), (2, 5000.0, 25000.0),
        |             (3, 20000.0, 40000.0), (4, 30000.0, 32000.0),
        |             (5, 50000.0, 60000.0), (6, 100.0, 2000.0)) AS b(band_id, lo, hi)
        |  ON l_extendedprice BETWEEN lo AND hi
        |GROUP BY 1""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = Seq((1L, 900.0, 10000.0), (2L, 5000.0, 25000.0),
        (3L, 20000.0, 40000.0), (4L, 30000.0, 32000.0),
        (5L, 50000.0, 60000.0), (6L, 100.0, 2000.0)).toDF("band_id", "lo", "hi")
      graft.operators.RangeJoin.pointInInterval(
          Tables.lineitem(s, d).select(col("l_extendedprice")), "l_extendedprice",
          bands, "lo", "hi", binWidth = 8000.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 2).as("total"))
    },

    // --- automatic range-join rewrite (plans.RangeJoinRewrite): the SAME
    // --- class of query as q33, but written as plain SQL BETWEEN — which
    // --- Spark would nested-loop — and rewritten to the binned equi-join by
    // --- the injected Catalyst optimizer rule. A session of its own: the
    // --- rule + bin width bind as session state, and a gate must not leak
    // --- an optimizer extension into sibling queries. ------------------------
    q("q45_auto_range_join",
      """SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN (VALUES (1, 1.0, 10.0), (2, 5.0, 25.0), (3, 20.0, 40.0),
        |             (4, 45.0, 50.0), (5, 30.0, 31.0)) AS b(band_id, lo, hi)
        |  ON l_quantity BETWEEN lo AND hi
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
      s2.conf.set("spark.graft.rangeJoin.binWidth", "8")
      Tables.lineitem(s2, d).createOrReplaceTempView("q45_lineitem")
      s2.sql(
        """SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM q45_lineitem
          |JOIN (VALUES (1, 1.0, 10.0), (2, 5.0, 25.0), (3, 20.0, 40.0),
          |             (4, 45.0, 50.0), (5, 30.0, 31.0)) AS b(band_id, lo, hi)
          |  ON l_quantity BETWEEN lo AND hi
          |GROUP BY 1""".stripMargin)
    },

    // --- JSON property extraction: the reference serializes json/jsonb (and
    // --- every unknown OID) through the string fallback (oid2avro.c:317–349)
    // --- — consumers re-type downstream. from_json with an explicit schema
    // --- is that re-typing in Spark (codegen'd, null on malformed); the
    // --- oracle re-types the same strings with DuckDB's JSON extractor.
    // --- All-integer aggregates ⇒ hash-exact. --------------------------------
    q("q48_json_extract",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS n_distinct_k,
        |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val k = from_json(col("props"), "k INT", Map.empty[String, String])("k")
      Tables.events(s, d)
        .select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // --- gap fill / forward fill (LOCF): carry each user's last 'update'
    // --- value onto every subsequent event — the time-series imputation
    // --- consumers run over compacted CDC topics, and the window twin of
    // --- the as-of join (q32 joins two streams; this fills within one).
    // --- last(_, ignoreNulls) over a ROWS frame = ONE exchange on user_id
    // --- + per-user sort; event_id is a total order so every engine
    // --- agrees; values pass through unfilled (no arithmetic) ⇒ hash-exact.
    q("q47_gap_fill",
      """SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'update' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM events""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"),
        last(when(col("event_type") === "update", col("value")),
          ignoreNulls = true).over(w).as("filled_value"))
    },

    // --- automatic OVERLAP rewrite (plans.RangeJoinRewrite shape 2): the
    // --- q37 interval-intersection semantics, but as plain SQL with NO
    // --- equi-key — Spark would nested-loop; the rule explodes both sides
    // --- to bins and attributes each pair to its overlap-start bin. Sides
    // --- are sparse orderkey samples so the quadratic naive oracle stays
    // --- cheap for DuckDB while the pair space is still ~23k². ---------------
    q("q46_auto_overlap_join",
      """WITH o AS (SELECT o_orderkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS lo,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 14 AS hi
        |  FROM orders),
        |a AS (SELECT o_orderkey AS a_key, lo AS a_lo, hi AS a_hi FROM o
        |  WHERE o_orderkey % 89 = 0),
        |b AS (SELECT o_orderkey AS b_key, lo AS b_lo, hi AS b_hi FROM o
        |  WHERE o_orderkey % 97 = 0)
        |SELECT COUNT(*) AS n_pairs, CAST(SUM(a_key + b_key) AS BIGINT) AS key_sum
        |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi""".stripMargin) { (s, d) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
      s2.conf.set("spark.graft.rangeJoin.binWidth", "16")
      Tables.orders(s2, d).createOrReplaceTempView("q46_orders")
      s2.sql(
        """WITH o AS (SELECT o_orderkey,
          |    CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS lo,
          |    CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) + 14 AS hi
          |  FROM q46_orders),
          |a AS (SELECT o_orderkey AS a_key, lo AS a_lo, hi AS a_hi FROM o
          |  WHERE o_orderkey % 89 = 0),
          |b AS (SELECT o_orderkey AS b_key, lo AS b_lo, hi AS b_hi FROM o
          |  WHERE o_orderkey % 97 = 0)
          |SELECT COUNT(*) AS n_pairs, CAST(SUM(a_key + b_key) AS BIGINT) AS key_sum
          |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi""".stripMargin)
    },

    // --- explicit skew-salted join (ScaleJoins.saltedJoin): semantics are
    // --- IDENTICAL to the plain equi-join (the oracle), salt only re-routes
    // --- rows — the deterministic fallback when AQE's runtime skew split
    // --- can't apply (e.g. skewed aggregation inputs, forced shuffle plans).
    // --- Plan-level skew behavior is pinned in ScaleJoinsSpec; this gate
    // --- pins that salting never changes results. -----------------------------
    q("q34_skew_salted_join",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("k"), col("l_quantity"))
      val ords = Tables.orders(s, d).select(col("o_orderkey").as("k"), col("o_orderstatus"))
      graft.operators.ScaleJoins.saltedJoin(li, ords, "k", saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
    },

    // --- tumbling time window over the event stream table ---------------------
    q("q26_hourly_events",
      """SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("total_value"))
    },

    // --- gaps-and-islands sessionization (Sessionize.assign): per-user
    // --- sessions split on >2h inactivity gaps, then per-session rollup.
    // --- Boundary math is integer epoch-micros on both sides (events ts is
    // --- exactly micro-precision — no sub-micro component in the data), so
    // --- session assignment is bit-deterministic across engines. The whole
    // --- sessionize→aggregate dataflow is ONE exchange on user_id. ------------
    q("q35_sessionize",
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS t_us FROM events),
        |s AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |    OR t_us - lag(t_us) OVER w > 7200000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |t AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM s)
        |SELECT user_id, session_no, COUNT(*) AS n_events,
        |  MIN(t_us) AS start_us, MAX(t_us) AS end_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM t GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("t_us"))
      graft.operators.Sessionize.assign(ev, Seq("user_id"), col("t_us"),
          Seq(col("event_id")), gap = 7200L * 1000000L)
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("t_us")).as("start_us"), max(col("t_us")).as("end_us"),
          dsum(col("value"), 2).as("session_value"))
    },

    // --- per-group top-k WITHOUT a window sort (TopK.topKPerGroup): a
    // --- bounded-buffer typed Aggregator with map-side partial aggregation —
    // --- the exchange carries O(groups·k·partitions) buffers instead of
    // --- every row, and no group is ever sorted whole. Oracle = the window
    // --- row_number() formulation; ties break on o_orderkey so the order is
    // --- total and both formulations agree bit-for-bit. ----------------------
    q("q36_topk_per_group",
      """SELECT o_orderstatus, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) t WHERE rank <= 5""".stripMargin) { (s, d) =>
      graft.operators.TopK.topKPerGroup(Tables.orders(s, d),
        "o_orderstatus", "o_totalprice", "o_orderkey", k = 5)
    },

    // --- interval × interval OVERLAP join (RangeJoin.intervalOverlap): pairs
    // --- of same-customer F/O orders whose 30-day windows intersect. Both
    // --- sides explode to bins, ONE equi-join on (bin, cust); a pair sharing
    // --- several bins survives only in the bin of its overlap start —
    // --- exactly-once without a distinct. Oracle = the naive theta join. ------
    q("q37_interval_overlap",
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS lo,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 30 AS hi
        |  FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderstatus = 'F'),
        |b AS (SELECT * FROM o WHERE o_orderstatus = 'O')
        |SELECT a.o_custkey AS cust, a.o_orderkey AS a_key, b.o_orderkey AS b_key
        |FROM a JOIN b ON a.o_custkey = b.o_custkey
        |  AND a.lo <= b.hi AND b.lo <= a.hi""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 30)
      def side(status: String, p: String) = o.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("cust"), col("o_orderkey").as(s"${p}_key"),
          col("lo").as(s"${p}_lo"), col("hi").as(s"${p}_hi"))
      graft.operators.RangeJoin.intervalOverlap(
          side("F", "a"), "a_lo", "a_hi", side("O", "b"), "b_lo", "b_hi",
          binWidth = 32, equiKeys = Seq("cust"))
        .select("cust", "a_key", "b_key")
    },

    // --- NOT IN three-valued-logic trap, via the SQL entry surface: a NULL
    // --- planted in the subquery list makes NOT IN empty (x <> NULL is
    // --- UNKNOWN for every x), while the null-free variant behaves like the
    // --- anti join. Spark plans the null-aware anti join; the gate pins that
    // --- both engines implement the standard's 3VL identically. -------------
    q("q38_not_in_null_semantics",
      """WITH s_null AS (SELECT s_nationkey AS x FROM supplier
        |    UNION ALL SELECT CAST(NULL AS INT)),
        |s_clean AS (SELECT s_nationkey AS x FROM supplier WHERE s_nationkey < 10)
        |SELECT
        |  (SELECT COUNT(*) FROM customer
        |    WHERE c_nationkey NOT IN (SELECT x FROM s_null)) AS n_with_null,
        |  (SELECT COUNT(*) FROM customer
        |    WHERE c_nationkey NOT IN (SELECT x FROM s_clean)) AS n_clean""".stripMargin) {
      (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q38_customer")
      Tables.supplier(s, d).createOrReplaceTempView("q38_supplier")
      s.sql("""
        WITH s_null AS (SELECT s_nationkey AS x FROM q38_supplier
            UNION ALL SELECT CAST(NULL AS INT)),
        s_clean AS (SELECT s_nationkey AS x FROM q38_supplier WHERE s_nationkey < 10)
        SELECT
          (SELECT COUNT(*) FROM q38_customer
            WHERE c_nationkey NOT IN (SELECT x FROM s_null)) AS n_with_null,
          (SELECT COUNT(*) FROM q38_customer
            WHERE c_nationkey NOT IN (SELECT x FROM s_clean)) AS n_clean""")
    },

    // --- RANGE-frame window (vs q13's ROWS running sum): per-customer
    // --- rolling 30-day order value — the frame is bounded by the ORDER
    // --- column's VALUE distance, so same-day peers are all in-frame
    // --- (deterministic under ties, unlike a ROWS frame) and gaps shrink
    // --- the window. Integer day axis + exact decimal sum ⇒ hash-exact. -----
    q("q42_range_frame_window",
      """SELECT o_orderkey, o_custkey, day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rolling_30d,
        |  COUNT(*) OVER w AS n_in_window
        |FROM (SELECT o_orderkey, o_custkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS day,
        |    o_totalprice FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("rolling_30d"),
          count(lit(1)).over(w).as("n_in_window"))
    },

    // --- distribution window functions (ntile / percent_rank / cume_dist):
    // --- the ranking-statistics family beyond q11's row_number/rank. Order
    // --- is total (o_totalprice then o_orderkey), so every engine agrees
    // --- bit-for-bit; percent_rank/cume_dist are exact small-integer
    // --- ratios ⇒ IEEE-identical. ------------------------------------------
    q("q44_distribution_windows",
      """SELECT o_orderkey, o_orderstatus,
        |  NTILE(10) OVER w AS decile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        ntile(10).over(w).as("decile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },

    // --- LATERAL correlated subquery join, via the SQL entry surface (like
    // --- q38): per-nation top-3 orders through the lateral planner path —
    // --- Catalyst decorrelates to a ranked join; DuckDB executes the same
    // --- ANSI text natively. Ties break on o_orderkey ⇒ total order. --------
    q("q43_lateral_topn",
      """SELECT n_name, o_orderkey, o_totalprice
        |FROM nation, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t""".stripMargin) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("q43_nation")
      Tables.orders(s, d).createOrReplaceTempView("q43_orders")
      Tables.customer(s, d).createOrReplaceTempView("q43_customer")
      s.sql("""
        SELECT n_name, o_orderkey, o_totalprice
        FROM q43_nation, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM q43_orders JOIN q43_customer ON o_custkey = c_custkey
          WHERE c_nationkey = n_nationkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t""")
    },

    // --- Bloom runtime filter (RuntimeFilter.prunedJoin): the fact side is
    // --- pre-filtered by a kilobytes-sized Bloom bitset built over the
    // --- SELECTIVE dim subset (urgent finished orders, ~6% of orders), so
    // --- the join exchange carries ~matching rows instead of all of
    // --- lineitem. False positives die in the exact join that follows —
    // --- the oracle is the plain join, results bit-identical. The
    // --- no-false-negative and pruning-ratio properties are spec-pinned. -----
    q("q40_bloom_pruned_join",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dim = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val fact = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
      graft.operators.RuntimeFilter.prunedJoin(fact, dim, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 2).as("revenue"))
    },

    // --- Z-order (Morton) clustering key (Layout.morton2): interleaves two
    // --- 16-bit dimensions so ONE sort key keeps BOTH columns locally
    // --- clustered — the layout that makes parquet min-max stats prune 2-D
    // --- box predicates (Delta/Iceberg's OPTIMIZE ZORDER BY, as a plain
    // --- codegen'd expression). The oracle replays the same mask-ladder
    // --- shifts in SQL; the file-pruning property is spec-pinned. ------------
    q("q41_zorder_key",
      """WITH b AS (SELECT o_orderkey, o_custkey & 65535 AS x,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) & 65535 AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, (x | (x << 8)) & 16711935 AS x1,
        |    (y | (y << 8)) & 16711935 AS y1 FROM b),
        |s2 AS (SELECT o_orderkey, (x1 | (x1 << 4)) & 252645135 AS x2,
        |    (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT o_orderkey, (x2 | (x2 << 2)) & 858993459 AS x3,
        |    (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT o_orderkey, (x3 | (x3 << 1)) & 1431655765 AS xs,
        |    (y3 | (y3 << 1)) & 1431655765 AS ys FROM s3)
        |SELECT b.o_orderkey, b.x, b.y, s4.xs | (s4.ys << 1) AS z
        |FROM b JOIN s4 USING (o_orderkey)""".stripMargin) { (s, d) =>
      val b = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(65535L)).as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .bitwiseAND(lit(65535L)).as("y"))
      b.select(col("o_orderkey"), col("x"), col("y"),
        graft.operators.Layout.morton2(col("x"), col("y")).as("z"))
    },

    // --- Hilbert layout key (q49): the locality upgrade over q41's Z-order —
    // --- consecutive Hilbert positions are ALWAYS adjacent cells, so range-
    // --- partitioned files cover tighter rectangles and min-max stats prune
    // --- harder (the same move Delta/Iceberg made over Z-order). The oracle
    // --- unrolls the 16 rotate-and-accumulate bit levels as a CTE ladder
    // --- (q41's spread-ladder style); Spark runs the identical walk as 16
    // --- let-bound codegen'd integer steps. ----------------------------------
    q("q49_hilbert_key",
      s"""WITH b AS (SELECT o_orderkey,
         |    o_custkey & 65535 AS x,
         |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) & 65535 AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM orders),
         |${hilbertLadderSql(16)}
         |SELECT b.o_orderkey, b.x, b.y, g0.d AS h
         |FROM b JOIN g0 USING (o_orderkey)""".stripMargin) { (s, d) =>
      val b = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey").bitwiseAND(lit(65535L)).as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .bitwiseAND(lit(65535L)).as("y"))
      b.select(col("o_orderkey"), col("x"), col("y"),
        graft.operators.Layout.hilbert2(col("x"), col("y")).as("h"))
    },

    // --- opt-in sketch substitution (q50, hash-green verdict-as-data): the
    // --- ApproxDistinctRewrite optimizer rule turns exact COUNT(DISTINCT)
    // --- into the HLL++ sketch when the session sets the conf — plan-level
    // --- query acceleration, OFF by default because results change (within
    // --- the sketch's rsd). The gate proves BOTH halves: the rewritten
    // --- plan actually contains the sketch (no silent no-op; folded into
    // --- every row's ok), and every group's estimate is within 3·rsd of
    // --- the exact count computed WITHOUT the rule. The emitted rows are
    // --- (o_orderstatus, exact_n, ok) — exact_n restated by the DuckDB
    // --- oracle, ok matched against literal TRUE.
    Q("q50_approx_distinct_rewrite", (s, d) => {
      val rsd = 0.05
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewrite
      s2.conf.set("spark.graft.approxDistinct.enabled", "true")
      s2.conf.set("spark.graft.approxDistinct.rsd", rsd.toString)
      Tables.orders(s2, d).createOrReplaceTempView("q50_orders")
      val apx = s2.sql(
        """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS apx
          |FROM q50_orders GROUP BY 1""".stripMargin)
      val fired = apx.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("approx_count_distinct")
      // The exact side MUST stay out of s2: joining the two frames would put
      // the whole joined plan under s2's optimizer and the rule would rewrite
      // the "exact" countDistinct into a sketch as well (observed — the two
      // sides then agree trivially and the gate is vacuous). Both aggregates
      // run distributed; only the per-group verdict combine is driver-side,
      // bounded by the handful of order statuses.
      val apxByStatus = apx.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exactRows = Tables.orders(s, d).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("exact_n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      import s.implicits._
      exactRows.map { case (status, exactN) =>
        val ap = apxByStatus.getOrElse(status, Long.MinValue)
        (status, exactN, fired && math.abs(ap - exactN) <= exactN * 3 * rsd)
      }.toDF("o_orderstatus", "exact_n", "ok")
    }, Some(
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_n, TRUE AS ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // --- left-join elimination (q52, the repo's THIRD optimizer rule,
    // --- hash-green verdict-as-data): generated BI SQL left-joins unused
    // --- dimensions "just in case"; under a declared unique key
    // --- (c_custkey) the JoinEliminationRewrite drops the join whole —
    // --- at 100 TB that is a full dimension shuffle+build never executed.
    // --- The gate proves both halves: the optimized plan truly has NO
    // --- join left (folded into ok), and the join-free result equals the
    // --- oracle's plain single-table aggregate — which IS the soundness
    // --- claim (left outer × unique key is row-preserving). ---------------
    Q("q52_join_elimination", (s, d) => {
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.JoinEliminationRewrite
      s2.conf.set("spark.graft.joinElim.enabled", "true")
      s2.conf.set("spark.graft.joinElim.uniqueKeys", "c_custkey")
      Tables.orders(s2, d).createOrReplaceTempView("q52_orders")
      Tables.customer(s2, d).createOrReplaceTempView("q52_customer")
      val res = s2.sql(
        """SELECT o_orderstatus, COUNT(*) AS n
          |FROM q52_orders o LEFT JOIN q52_customer c
          |  ON o.o_custkey = c.c_custkey
          |GROUP BY o_orderstatus""".stripMargin)
      val fired = res.queryExecution.optimizedPlan.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty
      res.withColumn("ok", lit(fired))
    }, Some(
      """SELECT o_orderstatus, COUNT(*) AS n, TRUE AS ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // --- ordered funnel (q54): the MATCH_RECOGNIZE-shaped question Spark
    // --- has no operator for — view, THEN click, THEN purchase, each step
    // --- strictly after the previous step's first-touch time. One min-agg
    // --- + join per step (3 here), never a per-user ordered event list —
    // --- a 10⁸-event user costs what a 10-event user costs. --------------
    q("q54_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT u.user_id,
        |  CASE WHEN p.user_id IS NOT NULL THEN 3
        |       WHEN c.user_id IS NOT NULL THEN 2
        |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin) { (s, d) =>
      graft.operators.Funnel.stages(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    },

    // --- bucketed co-located join (q53): the fact-fact join answer at
    // --- 100 TB — both tables WRITTEN bucketed (and sorted) on the join
    // --- key, so the join consumes the on-disk layout instead of
    // --- shuffling either side at read time; the exchange is paid ONCE at
    // --- write, amortized over every subsequent join. The layout is a
    // --- physical-plan property (spec pins the exchange-free sort-merge
    // --- join with broadcast off); this gate pins that the bucketed
    // --- round-trip loses no rows and aggregates exactly. ----------------
    q("q53_bucketed_join",
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      val wh = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bucketed_" + Integer.toHexString(d.hashCode)).getPath
      s.sql("DROP TABLE IF EXISTS g53_li")
      s.sql("DROP TABLE IF EXISTS g53_ord")
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").option("path", s"$wh/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("g53_li")
      Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").option("path", s"$wh/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("g53_ord")
      s.table("g53_li")
        .join(s.table("g53_ord"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
    },

    // --- recursive hierarchy rollup (q51): the WITH RECURSIVE surface
    // --- Spark SQL lacks, over a supplier org-tree (heap numbering:
    // --- parent(c) = (c-1)/2, root 0). Per node: depth, root ancestor,
    // --- and subtree count + exact decimal balance over all descendants.
    // --- The operator is PATH DOUBLING — ⌈log2 depth⌉ self-joins, not
    // --- depth dependent steps (Hierarchy scaladoc) — while the oracle is
    // --- DuckDB's literal one-step recursion; they must agree row-exactly.
    q("q51_hierarchy_rollup",
      """WITH RECURSIVE pairs(anc, node, dist) AS (
        |  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
        |  UNION ALL
        |  SELECT p.anc, s.s_suppkey, p.dist + 1 FROM pairs p
        |  JOIN supplier s ON s.s_suppkey >= 1 AND (s.s_suppkey - 1) // 2 = p.node),
        |up AS (SELECT node, dist AS depth, anc AS root FROM (
        |  SELECT node, anc, dist,
        |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY dist DESC) AS rn
        |  FROM pairs) t WHERE rn = 1),
        |down AS (SELECT anc, COUNT(*) AS n_subtree,
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS subtree_val
        |  FROM pairs JOIN supplier ON node = s_suppkey GROUP BY anc)
        |SELECT up.node, up.depth, up.root, down.n_subtree, down.subtree_val
        |FROM up JOIN down ON up.node = down.anc""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val edges = sup.filter(col("s_suppkey") >= 1)
        .select(col("s_suppkey").as("child"),
          expr("(s_suppkey - 1) div 2").cast("long").as("parent"))
      graft.operators.Hierarchy.rollup(sup, edges,
        "s_suppkey", "s_acctbal", "child", "parent")
    },

    // --- sketch RE-AGGREGATION over a time hierarchy (q55): the property
    // --- that makes sketches the 100 TB distinct-count answer — per
    // --- (event_type, day) HLL sketches are built once (the partial
    // --- aggregate a daily rollup table stores), then MERGED per
    // --- event_type without touching raw events again; COUNT DISTINCT
    // --- cannot re-aggregate that way (daily distinct counts don't sum —
    // --- a user active on many days must count once, which the sketch
    // --- union gets right by construction). Verdict-as-data (q27
    // --- discipline): estimates are engine-specific, so the gate emits the
    // --- merged estimate's 3·rsd bound check per event_type next to the
    // --- oracle-able exact count (lgK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.63%). ----
    Q("q55_sketch_reaggregate", (s, d) => {
      val ev = Tables.events(s, d)
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_n"))
      // both sides are |event_types| rows — the join is a broadcast nit
      merged.join(exact, Seq("event_type"))
        .select(col("event_type"), col("exact_n"),
          (abs(col("est").cast("double") - col("exact_n").cast("double")) <=
            lit(3 * 0.0163) * col("exact_n").cast("double")).as("ok"))
    }, Some(
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_n, TRUE AS ok
        |FROM events GROUP BY 1""".stripMargin)),

    // --- cohort retention (q56): the product-analytics staple — users
    // --- bucketed by first-activity week, activity counted per
    // --- (cohort_week, week_offset). Two distinct-aggregations and one
    // --- join on user_id; weeks are Monday-truncated in both engines and
    // --- the offset is an exact integer division of whole days. ----------
    q("q56_cohort_retention",
      """WITH f AS (SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
        |SELECT CAST(f.cw AS DATE) AS cohort_week,
        |  (CAST(aw AS DATE) - CAST(cw AS DATE)) // 7 AS week_offset,
        |  COUNT(*) AS n_users
        |FROM f JOIN act USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val first = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cw"))
      val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
        .distinct()
      first.join(act, Seq("user_id"))
        .groupBy(col("cw").cast("date").as("cohort_week"),
          expr("datediff(aw, cw) div 7").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // --- iterative graph ranking (q57): integer-exact PageRank, 2 unrolled
    // --- rounds over the order↔part bipartite graph. Floor-division
    // --- fixed-point ranks are bit-identical across engines and
    // --- partitionings (the unrolled-Lloyd discipline on graphs), so the
    // --- whole iteration chain value-oracles; the CAST pins DuckDB's
    // --- HUGEINT sum widening back to BIGINT. -----------------------------
    q("q57_pagerank",
      """WITH ep AS (SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS a,
        |    'p' || CAST(l_partkey AS VARCHAR) AS b FROM lineitem),
        |e AS (SELECT a AS src, b AS dst FROM ep
        |      UNION ALL SELECT b AS src, a AS dst FROM ep),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
        |c1 AS (SELECT e.dst AS node, SUM(1000000 // od.od) AS s
        |  FROM e JOIN od ON e.src = od.src GROUP BY 1),
        |r1 AS (SELECT n.node,
        |    CAST(150000 + (850 * COALESCE(c1.s, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, SUM(r1.r // od.od) AS s
        |  FROM e JOIN od ON e.src = od.src JOIN r1 ON r1.node = e.src GROUP BY 1),
        |r2 AS (SELECT n.node,
        |    CAST(150000 + (850 * COALESCE(c2.s, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 ON n.node = c2.node)
        |SELECT node, r FROM r2""".stripMargin) { (s, d) =>
      val ep = Tables.lineitem(s, d)
        .select(concat(lit("o"), col("l_orderkey")).as("a"),
          concat(lit("p"), col("l_partkey")).as("b"))
        .distinct()
      val edges = ep.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(ep.select(col("b").as("src"), col("a").as("dst")))
      graft.operators.PageRank.integerPageRank(edges, "src", "dst", iters = 2)
    },

    // --- calendar gap-fill (q58): dense per-type daily series with ZERO
    // --- rows for silent days — the reporting shape a sparse activity
    // --- table (here: the ~1% event_id%97 slice) can't produce with a
    // --- plain GROUP BY, and the dual of q47's LOCF fill. The day spine is
    // --- generated from the global span (one scalar agg, broadcast), the
    // --- type×day cross is |types|·|days| rows, and the actual counts
    // --- left-join onto it. ------------------------------------------------
    q("q58_calendar_gap_fill",
      """WITH sparse AS (SELECT * FROM events WHERE event_id % 97 = 0),
        |span AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        |  FROM sparse),
        |days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM sparse),
        |actual AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM sparse GROUP BY 1, 2)
        |SELECT t.event_type, d.day, COALESCE(a.n, 0) AS n
        |FROM types t CROSS JOIN days d
        |LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = d.day""".stripMargin) { (s, d) =>
      // the calendar spine as the reusable SequenceAudit.dailyCounts:
      // O(days) spine from a 1-row span aggregate, zero-filled left join
      graft.operators.SequenceAudit.dailyCounts(
        Tables.events(s, d).filter(col("event_id") % 97 === 0),
        Seq("event_type"), col("ts"))
    },

    // --- referential-integrity audit (q59): the data-quality report a
    // --- warehouse runs over a star schema — orphans (children without
    // --- parents) and childless parents, one anti-join each, unioned into
    // --- a single (check, n) report. Anti joins broadcast their smaller
    // --- side; each check scans only its two key columns. ----------------
    q("q59_integrity_audit",
      """SELECT 'lineitem_without_order' AS chk, COUNT(*) AS n FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'order_without_customer', COUNT(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'order_without_lineitem', COUNT(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'customer_without_order', COUNT(*) FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT 'part_never_ordered', COUNT(*) FROM part p
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin) { (s, d) =>
      def orphans(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String) =
        child.join(parent, child(ck) === parent(pk), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit(name).as("chk"), col("n"))
      orphans("lineitem_without_order",
          Tables.lineitem(s, d), "l_orderkey", Tables.orders(s, d), "o_orderkey")
        .unionByName(orphans("order_without_customer",
          Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
        .unionByName(orphans("order_without_lineitem",
          Tables.orders(s, d), "o_orderkey", Tables.lineitem(s, d), "l_orderkey"))
        .unionByName(orphans("customer_without_order",
          Tables.customer(s, d), "c_custkey", Tables.orders(s, d), "o_custkey"))
        .unionByName(orphans("part_never_ordered",
          Tables.part(s, d), "p_partkey", Tables.lineitem(s, d), "l_partkey"))
    },

    // --- UNPIVOT / melt (q60): the inverse of q28's PIVOT — wide numeric
    // --- attributes to long (key, attr, val) form, the normalization step
    // --- before generic per-attribute profiling. Spark's native unpivot
    // --- (Expand under the hood: one pass, rows × n_attrs, no shuffle);
    // --- oracle is the literal UNION ALL definition. ----------------------
    q("q60_unpivot",
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "attr", "val")
    },

    // --- trailing-window distinct actives (q61): rolling 7-day WAU per
    // --- day — the metric COUNT(DISTINCT) OVER RANGE cannot express and
    // --- daily distincts cannot sum (a user active twice in the window
    // --- counts once). Shape: dedup to (user, day) first (the big
    // --- reduction), then each pair CONTRIBUTES to the ≤7 report days it
    // --- covers (a bounded explode), one distinct-agg per report day.
    // --- Window length is the only fan-out factor — at 100 TB this is
    // --- O(active-pairs · window), never events · window. ----------------
    q("q61_rolling_actives",
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM du),
        |c AS (SELECT user_id, CAST(unnest(generate_series(
        |    CAST(day AS TIMESTAMP), CAST(day + 6 AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM du)
        |SELECT c.day, COUNT(DISTINCT user_id) AS wau
        |FROM c, span WHERE c.day BETWEEN span.d0 AND span.d1
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val span = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      du.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6),
            expr("interval 1 day"))).as("day"))
        .crossJoin(broadcast(span))
        .filter(col("day").between(col("d0"), col("d1")))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
    },

    // --- robust outlier report (q62): median/MAD per group — the outlier
    // --- detector that survives the outliers it hunts (mean/stddev get
    // --- dragged by them). Two exact interpolated-percentile passes (q30's
    // --- proven-portable aggregate) + one conditional count; medians
    // --- broadcast back per group. -----------------------------------------
    q("q62_robust_outliers",
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type, MIN(dev.med) AS med, MIN(mad.mad) AS mad,
        |  CAST(SUM(CASE WHEN dev.ad > 3*mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), col("med"),
          abs(col("value") - col("med")).as("ad"))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(ad, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
          sum(when(col("ad") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // --- event-transition matrix (q63): per-user next-event bigrams with
    // --- per-source transition probabilities — the Markov-chain view of a
    // --- clickstream. One user-keyed window for the successor, one
    // --- grouped count, one tiny window for the row-normalization; the
    // --- probability is a single division of exact counts. ---------------
    q("q63_event_transitions",
      """WITH seq AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        |  FROM events)
        |SELECT event_type AS src, nxt AS dst, COUNT(*) AS n,
        |  CAST(COUNT(*) AS DOUBLE) /
        |    SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
        |FROM seq WHERE nxt IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val seq = Tables.events(s, d).select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id"))).as("nxt"))
      seq.filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("src"))))
    },

    // --- grouped linear regression + correlation (q64): per-type OLS
    // --- slope/intercept and Pearson r of value over time, from the
    // --- closed-form sufficient statistics — every Σ is an EXACT decimal
    // --- sum (the dsum discipline, with products of decimal-cast inputs
    // --- staying exact through multiply+sum), so the handful of final
    // --- IEEE operations is engine-identical and the regression
    // --- hash-matches. One partial-agg'd aggregation; nothing iterative. --
    q("q64_group_regression",
      """WITH pts AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
        |    value AS y FROM events),
        |s AS (SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(x AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(x AS DECIMAL(18,4)) * CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(y AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS syy
        |  FROM pts GROUP BY 1)
        |SELECT event_type, n,
        |  (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
        |  (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n AS intercept,
        |  (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS r
        |FROM s""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(18, 4)
      val pts = Tables.events(s, d).select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        col("value").as("y"))
      val st = pts.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).cast("double").as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).cast("double").as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).cast("double").as("syy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      st.select(col("event_type"), col("n"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("r"))
    },

    // --- time-weighted average (q65): per-user TWAP of `value` held between
    // --- consecutive events (the LOCF-interval weighting q47 fills with) —
    // --- the metric a plain AVG gets wrong whenever sampling is irregular.
    // --- Interval durations are exact epoch-micros differences from ONE
    // --- user-keyed lead() window; Σ(value·dur) and Σ(dur) are exact
    // --- decimal sums, so the single final IEEE division hash-matches.
    // --- value is quantized at scale 1 so the per-user Σ(value·dur)
    // --- UNSCALED magnitude stays < 2^53: DuckDB casts wide decimals to
    // --- double in two roundings (int128→double, then /10^scale) while
    // --- Java rounds once — identical only while the unscaled value is
    // --- double-exact. One exchange on the user key; output O(users). ----
    q("q65_time_weighted_avg",
      """WITH iv AS (SELECT user_id, value,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
        |    - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  CAST(SUM(CAST(value AS DECIMAL(18,1)) * CAST(dur AS DECIMAL(18,0))) AS DOUBLE)
        |    / CAST(SUM(CAST(dur AS DECIMAL(18,0))) AS DOUBLE) AS twap
        |FROM iv WHERE dur IS NOT NULL GROUP BY 1""".stripMargin) { (s, d) =>
      val iv = Tables.events(s, d).select(col("user_id"), col("value"),
        (lead(unix_micros(col("ts")), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id")))
          - unix_micros(col("ts"))).as("dur"))
      iv.filter(col("dur").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          (sum(col("value").cast(DecimalType(18, 1))
              * col("dur").cast(DecimalType(18, 0))).cast("double")
            / sum(col("dur").cast(DecimalType(18, 0))).cast("double"))
            .as("twap"))
    },

    // --- last-touch attribution (q66): each purchase credited to the most
    // --- recent PRECEDING click/view by the same user (the marketing
    // --- attribution view). The exclusive-frame last(_, ignoreNulls)
    // --- window ships every event once through one user-keyed exchange —
    // --- never a per-conversion scan-back join; purchases with no prior
    // --- touch land in 'none'. -------------------------------------------
    q("q66_last_touch_attribution",
      """WITH t AS (SELECT user_id, event_type,
        |  last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT COALESCE(touch, 'none') AS touch, COUNT(*) AS n_conversions,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM t WHERE event_type = 'purchase' GROUP BY 1""".stripMargin) { (s, d) =>
      val touch = last(
        when(col("event_type").isin("click", "view"), col("event_type")),
        ignoreNulls = true)
        .over(Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), touch.as("touch"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_conversions"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // --- data-quality constraint audit (q67, Deequ-style): declared
    // --- expectations over `orders` — key uniqueness, column completeness,
    // --- value bounds, set membership, cross-column sanity — evaluated in
    // --- ONE full-scan aggregation (every check is a conditional count that
    // --- partial-aggregates map-side), then unpivoted to a (check,
    // --- violations, ok) report. The 100 TB shape: N checks cost one scan,
    // --- not N. Uniqueness rides a second count-distinct pass over the key
    // --- column only. ----------------------------------------------------
    q("q67_constraint_audit",
      """WITH a AS (SELECT
        |  COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_orderkey) AS n_keys,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
        |  CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01 00:00:00'
        |    OR o_orderdate > TIMESTAMP '1998-12-31 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS bad_date
        |  FROM orders)
        |SELECT 'key_unique' AS checkname, n_rows - n_keys AS violations,
        |  n_rows = n_keys AS ok FROM a
        |UNION ALL SELECT 'custkey_complete', null_cust, null_cust = 0 FROM a
        |UNION ALL SELECT 'price_positive', bad_price, bad_price = 0 FROM a
        |UNION ALL SELECT 'status_domain', bad_status, bad_status = 0 FROM a
        |UNION ALL SELECT 'date_in_range', bad_date, bad_date = 0 FROM a""".stripMargin) { (s, d) =>
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      val a = Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        cnt(col("o_custkey").isNull).as("null_cust"),
        cnt(col("o_totalprice") <= 0).as("bad_price"),
        cnt(!col("o_orderstatus").isin("O", "F", "P")).as("bad_status"),
        cnt(col("o_orderdate") < to_timestamp(lit("1992-01-01 00:00:00"))
          || col("o_orderdate") > to_timestamp(lit("1998-12-31 00:00:00")))
          .as("bad_date"))
      a.select(expr(
        """stack(5,
          |  'key_unique', n_rows - n_keys, n_rows = n_keys,
          |  'custkey_complete', null_cust, null_cust = 0L,
          |  'price_positive', bad_price, bad_price = 0L,
          |  'status_domain', bad_status, bad_status = 0L,
          |  'date_in_range', bad_date, bad_date = 0L)
          |  AS (checkname, violations, ok)""".stripMargin))
    },

    // --- equi-depth histogram (q68): the optimizer-statistics object —
    // --- 8 buckets holding ~equal row counts over o_totalprice. Inner
    // --- boundaries come from ONE exact interpolated-percentile aggregation
    // --- (q30's proven-portable quantile), broadcast as a single row; each
    // --- row's bucket is then 7 comparisons summed — never an NTILE global
    // --- sort (a SinglePartition window at 100 TB). Ties at a boundary go
    // --- left (strict > counts). -----------------------------------------
    q("q68_equidepth_histogram",
      """WITH b AS (SELECT quantile_cont(o_totalprice,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs FROM orders),
        |r AS (SELECT o_totalprice AS v,
        |  CASE WHEN v > bs[1] THEN 1 ELSE 0 END + CASE WHEN v > bs[2] THEN 1 ELSE 0 END
        |  + CASE WHEN v > bs[3] THEN 1 ELSE 0 END + CASE WHEN v > bs[4] THEN 1 ELSE 0 END
        |  + CASE WHEN v > bs[5] THEN 1 ELSE 0 END + CASE WHEN v > bs[6] THEN 1 ELSE 0 END
        |  + CASE WHEN v > bs[7] THEN 1 ELSE 0 END AS bucket
        |  FROM orders, b)
        |SELECT bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
        |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val b = o.agg(expr(
        "percentile(o_totalprice, array(0.125D,0.25D,0.375D,0.5D,0.625D,0.75D,0.875D))")
        .as("bs"))
      val bucket = (1 to 7).map(i =>
        when(col("o_totalprice") > element_at(col("bs"), i), 1).otherwise(0))
        .reduce(_ + _)
      o.crossJoin(broadcast(b))
        .select(col("o_totalprice").as("v"), bucket.as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
    },

    // --- EWMA smoothing (q69): per-user half-life-weighted recent value,
    // --- over each user's last 16 events (weight 2^-r for recency rank r).
    // --- The ratio is computed with weights multiplied through by 2^16 —
    // --- INTEGER weights 2^(16−r), the same quotient — so every weighted
    // --- term is an exact small decimal product (unscaled < 2^53, the q65
    // --- double-rounding discipline), both Σ are exact, and the one final
    // --- IEEE division hash-matches: the engine-portable EWMA no libm
    // --- exp() formulation allows. Bounding to 16 terms is what keeps the
    // --- weights integral AND bounds the window state. One user-keyed
    // --- window + one aggregation. ---------------------------------------
    q("q69_ewma_smoothing",
      """WITH r AS (SELECT user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_used,
        |  CAST(SUM(CAST(value AS DECIMAL(10,4)) * CAST(power(2.0, 16 - rn) AS BIGINT)) AS DOUBLE)
        |  / CAST(SUM(CAST(power(2.0, 16 - rn) AS BIGINT)) AS DOUBLE) AS ewma
        |FROM r WHERE rn <= 16 GROUP BY 1""".stripMargin) { (s, d) =>
      val r = Tables.events(s, d).select(col("user_id"), col("value"),
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id").desc))
          .as("rn"))
      val w = pow(lit(2.0), lit(16) - col("rn")).cast("long")
      r.filter(col("rn") <= 16)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_used"),
          (sum(col("value").cast(DecimalType(10, 4)) * w).cast("double")
            / sum(w).cast("double")).as("ewma"))
    },

    // --- table diff / reconciliation (q70): the anti-entropy audit — does
    // --- the replica match the source? Planted drift over orders (removed
    // --- %97 keys, +1 price on %101, added keys past 10M) must come back
    // --- as exactly those keys with change type and the per-column change
    // --- set. ONE full-outer hash join on the key (co-located and
    // --- exchange-free when both sides are bucketed on it); matching rows
    // --- die before the report materializes — output O(divergence). ------
    q("q70_table_diff",
      """WITH oldt AS (SELECT * FROM orders),
        |newt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'O', 1.0,
        |    TIMESTAMP '1995-01-01 00:00:00', 'added'
        |  FROM orders WHERE o_orderkey % 103 = 0),
        |j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  o.o_orderkey AS lk, n.o_orderkey AS rk,
        |  list_filter([
        |    CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey THEN 'o_custkey' END,
        |    CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
        |    CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END,
        |    CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate THEN 'o_orderdate' END,
        |    CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END],
        |    x -> x IS NOT NULL) AS cc
        |  FROM oldt o FULL JOIN newt n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN lk IS NULL THEN 'added' WHEN rk IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  CASE WHEN lk IS NULL OR rk IS NULL THEN ''
        |       ELSE array_to_string(cc, ',') END AS changed_cols
        |FROM j WHERE lk IS NULL OR rk IS NULL OR len(cc) > 0""".stripMargin) { (s, d) =>
      import graft.operators.TableDiff
      val o = Tables.orders(s, d)
      val oldT = o
      val newT = o.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .unionByName(o.filter(col("o_orderkey") % 103 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_custkey"), lit("O").as("o_orderstatus"),
            lit(1.0).as("o_totalprice"),
            to_timestamp(lit("1995-01-01 00:00:00")).as("o_orderdate"),
            lit("added").as("o_orderpriority")))
      TableDiff.diff(oldT, newT, "o_orderkey")
    },

    // --- exact distinct-count rollup via bitmaps (q71): per-(type, day,
    // --- bucket) user bitmaps built ONCE, then OR-merged per type and
    // --- popcounted — the EXACT twin of q55's HLL re-aggregation: daily
    // --- distincts don't sum, but daily BITMAPS union losslessly, so any
    // --- period's exact distinct count comes from merging KB-sized
    // --- bitmaps instead of re-shuffling raw user ids. Both aggregation
    // --- levels partial-agg map-side; the bucket split keeps each bitmap
    // --- a bounded 4 KB. Oracle = plain COUNT(DISTINCT). ------------------
    q("q71_bitmap_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
        .groupBy(col("event_type"), col("day"),
          expr("bitmap_bucket_number(user_id)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
          .as("bm"))
      daily.groupBy(col("event_type"), col("bucket"))
        .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("n_part"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_part")).as("n_users"))
    },

    // --- co-purchase triangle census (q72): triangles and wedges of the
    // --- parts-bought-together graph (1-in-10 part slice) + the global
    // --- clustering coefficient — the graph-cohesion statistic behind
    // --- recommendation quality checks. Edges from one order self-join
    // --- (u < v dedup), triangles from two hash equi-joins closed by a
    // --- third (the id-ordered orientation counts each triangle once);
    // --- wedges from degrees alone — Σ C(deg,2) — never a path join. At
    // --- scale the orientation key becomes DEGREE (not id) so hub
    // --- vertices don't fan out quadratically; same dataflow. -------------
    q("q72_triangle_census",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT x, COUNT(*) AS dg FROM (
        |  SELECT u AS x FROM e UNION ALL SELECT v FROM e) t GROUP BY 1),
        |wed AS (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
        |tri AS (SELECT COUNT(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |ne AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT ne.n_edges, wed.n_wedges, tri.n_triangles,
        |  3.0 * tri.n_triangles / wed.n_wedges AS global_cc
        |FROM ne, wed, tri""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      val deg = e.select(col("u").as("x"))
        .unionAll(e.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("dg"))
      val wed = deg.agg(sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
      val tri = e.alias("e1").join(e.alias("e2"), col("e1.v") === col("e2.u"))
        .join(e.alias("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .agg(count(lit(1)).as("n_triangles"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      ne.crossJoin(wed).crossJoin(tri)
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          (lit(3.0) * col("n_triangles") / col("n_wedges")).as("global_cc"))
    },

    // --- relative-ranking window family (q73): percent_rank, cume_dist,
    // --- ntile — the remaining SQL window rank functions (q11 covers
    // --- row_number/rank/dense_rank). All three are exact integer ratios /
    // --- bucket arithmetic over a TOTAL order ((price, key) tie-break), so
    // --- they hash-match; the 1-in-100 key sample bounds the report, taken
    // --- AFTER ranking (sampling first would change every rank). ----------
    q("q73_relative_rank",
      """WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey))
        |SELECT o_orderstatus, o_orderkey, pr, cd,
        |  CAST(quartile AS BIGINT) AS quartile
        |FROM r WHERE o_orderkey % 100 = 0""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"))
        .filter(col("o_orderkey") % 100 === 0)
    },

    // --- relational division (q74): customers whose orders span EVERY
    // --- priority class — "for all" over a dimension, the one classic
    // --- relational operator joins/aggregations don't spell directly. The
    // --- scalable formulation: distinct (cust, priority) once, count per
    // --- cust, compare to the (broadcast scalar) universe count — two
    // --- partial-agg'd aggregations, no per-customer subquery. The ORACLE
    // --- is the textbook double-NOT-EXISTS — an INDEPENDENT formulation,
    // --- so the gate cross-checks division semantics, not arithmetic. -----
    q("q74_relational_division",
      """SELECT c.o_custkey
        |FROM (SELECT DISTINCT o_custkey FROM orders) c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.o_custkey
        |      AND o.o_orderpriority = p.o_orderpriority))""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val universe = o.agg(
        countDistinct(col("o_orderpriority")).as("_n_all"))
      o.select(col("o_custkey"), col("o_orderpriority")).distinct()
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("_n"))
        .crossJoin(broadcast(universe))
        .filter(col("_n") === col("_n_all"))
        .select(col("o_custkey"))
    },

    // --- k-anonymity generalization audit (q75): publish customer rows
    // --- only in quasi-identifier groups of ≥ k=5 — records in small
    // --- (nation, segment, fine acctbal band) groups fall back to a
    // --- coarser band, and records still unsafe there are suppressed (the
    // --- one-round Mondrian shape). Counting is two partial-agg'd
    // --- groupBys + one broadcast-joined recheck over the REMAINING rows
    // --- only (records already safe at fine level never re-count). The
    // --- report is the (level, n_groups, n_rows) compliance summary. -----
    q("q75_k_anonymity",
      """WITH f AS (SELECT c_custkey, c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 100) AS BIGINT) AS b_fine,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS b_coarse
        |  FROM customer),
        |fg AS (SELECT c_nationkey, c_mktsegment, b_fine, COUNT(*) AS n
        |  FROM f GROUP BY 1, 2, 3),
        |fine AS (SELECT f.* FROM f JOIN fg USING (c_nationkey, c_mktsegment, b_fine)
        |  WHERE fg.n >= 5),
        |rest AS (SELECT f.* FROM f JOIN fg USING (c_nationkey, c_mktsegment, b_fine)
        |  WHERE fg.n < 5),
        |cg AS (SELECT c_nationkey, c_mktsegment, b_coarse, COUNT(*) AS n
        |  FROM rest GROUP BY 1, 2, 3),
        |coarse AS (SELECT rest.* FROM rest
        |  JOIN cg USING (c_nationkey, c_mktsegment, b_coarse) WHERE cg.n >= 5),
        |supp AS (SELECT rest.* FROM rest
        |  JOIN cg USING (c_nationkey, c_mktsegment, b_coarse) WHERE cg.n < 5)
        |SELECT 'fine' AS level, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT (c_nationkey, c_mktsegment, b_fine)) AS n_groups FROM fine
        |UNION ALL SELECT 'coarse', COUNT(*),
        |  COUNT(DISTINCT (c_nationkey, c_mktsegment, b_coarse)) FROM coarse
        |UNION ALL SELECT 'suppressed', COUNT(*),
        |  COUNT(DISTINCT (c_nationkey, c_mktsegment, b_coarse)) FROM supp""".stripMargin) { (s, d) =>
      val f = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100).cast("long").as("b_fine"),
        floor(col("c_acctbal") / 1000).cast("long").as("b_coarse"))
      val qiF = Seq("c_nationkey", "c_mktsegment", "b_fine")
      val qiC = Seq("c_nationkey", "c_mktsegment", "b_coarse")
      val fg = f.groupBy(qiF.map(col): _*).agg(count(lit(1)).as("_nf"))
      val withF = f.join(fg, qiF)
      val fine = withF.filter(col("_nf") >= 5)
      val rest = withF.filter(col("_nf") < 5)
      val cg = rest.groupBy(qiC.map(col): _*).agg(count(lit(1)).as("_nc"))
      val withC = rest.join(cg, qiC)
      def report(name: String, df: org.apache.spark.sql.DataFrame,
          qi: Seq[String]) =
        df.agg(count(lit(1)).as("n_rows"),
          countDistinct(struct(qi.map(col): _*)).as("n_groups"))
          .select(lit(name).as("level"), col("n_rows"), col("n_groups"))
      report("fine", fine, qiF)
        .unionByName(report("coarse", withC.filter(col("_nc") >= 5), qiC))
        .unionByName(report("suppressed", withC.filter(col("_nc") < 5), qiC))
    },

    // --- metadata-only COUNT(*) (q76, the repo's FOURTH optimizer rule,
    // --- hash-green verdict-as-data): an unfiltered COUNT(*) over parquet
    // --- is answered from footer row counts — the whole Aggregate+scan
    // --- collapses to a LocalRelation at optimization time, zero data
    // --- pages read (every warehouse's most common query against a fresh
    // --- table). The gate proves BOTH halves: the optimized plan is a
    // --- LocalRelation with no surviving relation scan (folded into ok),
    // --- and the footer sum equals the oracle's real COUNT(*). A filtered
    // --- count on the same session must NOT fire (stand-down guard in ok
    // --- too: predicates make footer counts wrong). -----------------------
    Q("q76_metadata_count", (s, d) => {
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.MetadataCountRewrite
      s2.conf.set("spark.graft.metaCount.enabled", "true")
      val cnt = Tables.orders(s2, d).agg(count(lit(1)).as("n"))
      val fired = cnt.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty
      val filtered = Tables.orders(s2, d)
        .filter(col("o_orderkey") % 2 === 0).agg(count(lit(1)).as("n"))
      val stoodDown = filtered.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isEmpty
      cnt.withColumn("ok", lit(fired && stoodDown))
    }, Some("SELECT COUNT(*) AS n, TRUE AS ok FROM orders"))
    ,

    // --- summary-table navigation (q77): answer a coarser aggregate from a
    // --- MATERIALIZED summary instead of the fact table — the aggregate-
    // --- navigation move every warehouse's cube layer makes. The summary
    // --- keeps its sums as DECIMAL (additive, exactly re-aggregable; the
    // --- non-additive distinct case is what q55's sketches and q71's
    // --- bitmaps solve), so rolling (flag, status) up to (flag) reads
    // --- O(groups) summary rows — the 100 TB fact is scanned ONCE at
    // --- summary-build time, never per query. Oracle = the direct
    // --- fact-table aggregate: navigation must change nothing. ------------
    Q("q77_summary_navigation", (s, d) => {
      val sumDir = java.nio.file.Files
        .createTempDirectory("q77sum").toString + "/t"
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
          count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(sumDir)
      s.read.parquet(sumDir)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("sum_qty")).cast("double").as("sum_qty"),
          sum(col("n")).as("n"))
    }, Some(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin)),

    // --- winsorization (q78): clamp o_totalprice into its [p05, p95] band
    // --- — the outlier treatment a feature pipeline applies before scaling
    // --- (clipping, unlike dropping, keeps the row count). Bounds come
    // --- from ONE exact interpolated-percentile aggregate (q30's portable
    // --- quantile) broadcast as a single row; the clamp is a projection;
    // --- the report shows per-status n, clamped counts both sides, and
    // --- the exact-decimal mean before/after. --------------------------
    q("q78_winsorize",
      """WITH b AS (SELECT quantile_cont(o_totalprice, [0.05, 0.95]) AS bs
        |  FROM orders),
        |w AS (SELECT o_orderstatus, o_totalprice,
        |  CASE WHEN o_totalprice < bs[1] THEN bs[1]
        |       WHEN o_totalprice > bs[2] THEN bs[2]
        |       ELSE o_totalprice END AS clamped,
        |  CASE WHEN o_totalprice < bs[1] THEN 1 ELSE 0 END AS lo,
        |  CASE WHEN o_totalprice > bs[2] THEN 1 ELSE 0 END AS hi
        |  FROM orders, b)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(lo) AS BIGINT) AS n_clamped_low,
        |  CAST(SUM(hi) AS BIGINT) AS n_clamped_high,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS mean_raw,
        |  CAST(SUM(CAST(clamped AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS mean_winsorized
        |FROM w GROUP BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val b = o.agg(expr("percentile(o_totalprice, array(0.05D, 0.95D))")
        .as("bs"))
      val lo = element_at(col("bs"), 1)
      val hi = element_at(col("bs"), 2)
      val clamped = when(col("o_totalprice") < lo, lo)
        .when(col("o_totalprice") > hi, hi)
        .otherwise(col("o_totalprice"))
      o.crossJoin(broadcast(b))
        .select(col("o_orderstatus"), col("o_totalprice"),
          clamped.as("clamped"),
          when(col("o_totalprice") < lo, 1L).otherwise(0L).as("lo_f"),
          when(col("o_totalprice") > hi, 1L).otherwise(0L).as("hi_f"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("lo_f")).as("n_clamped_low"),
          sum(col("hi_f")).as("n_clamped_high"),
          davg(col("o_totalprice")).as("mean_raw"),
          davg(col("clamped")).as("mean_winsorized"))
    },

    // --- distribution drift / binned KS statistic (q79): are 'O' and 'F'
    // --- orders priced from the same distribution? 20 equi-width bins over
    // --- the global [min, max], per-slice cumulative counts, and the KS
    // --- distance max_b |cdf1 − cdf2| computed as an EXACT integer
    // --- cross-multiplication max |cum1·n2 − cum2·n1| (no per-bin
    // --- division; one final IEEE divide) — the training/serving drift
    // --- test an ML feature pipeline runs, engine-portable. Two scans
    // --- (bounds, bins), windows over the 20-row bin frame only. --------
    q("q79_ks_drift",
      """WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |r AS (SELECT o_orderstatus AS s,
        |  LEAST(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20)) AS BIGINT), 19) AS bin
        |  FROM orders, b WHERE o_orderstatus IN ('O', 'F')),
        |c AS (SELECT bin,
        |  CAST(SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM r GROUP BY 1),
        |cum AS (SELECT bin,
        |  SUM(c1) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS k1,
        |  SUM(c2) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS k2,
        |  SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM c)
        |SELECT CAST(MAX(abs(k1*n2 - k2*n1)) AS BIGINT) AS ks_num,
        |  CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
        |  CAST(MAX(abs(k1*n2 - k2*n1)) AS DOUBLE)
        |    / (CAST(MIN(n1) AS DOUBLE) * CAST(MIN(n2) AS DOUBLE)) AS ks
        |FROM cum""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F"))
      val b = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      val r = o.crossJoin(broadcast(b))
        .select(col("o_orderstatus").as("s"),
          least(floor((col("o_totalprice") - col("lo"))
            / ((col("hi") - col("lo")) / 20)).cast("long"), lit(19L))
            .as("bin"))
      val c = r.groupBy(col("bin")).agg(
        sum(when(col("s") === "O", 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === "F", 1L).otherwise(0L)).as("c2"))
      // both CDFs via GlobalRank's two-level prefix sum (bucket-local
      // windows over the 20-bin frame); the grand totals come free from the
      // same bucket-totals passes — no empty-partition window anywhere
      val cum = graft.operators.GlobalRank.cumSum(
        graft.operators.GlobalRank.cumSum(c, Seq(col("bin")), col("c1"), "k1",
          nBuckets = 4, totalCol = Some("n1")),
        Seq(col("bin")), col("c2"), "k2", nBuckets = 4, totalCol = Some("n2"))
      cum.agg(
        max(abs(col("k1") * col("n2") - col("k2") * col("n1"))).as("ks_num"),
        min(col("n1")).as("n1"), min(col("n2")).as("n2"))
        .select(col("ks_num"), col("n1"), col("n2"),
          (col("ks_num").cast("double")
            / (col("n1").cast("double") * col("n2").cast("double"))).as("ks"))
    },

    // --- conversion latency (q80): per user, time from FIRST view to
    // --- FIRST subsequent purchase (null when never converting), rolled
    // --- into a distribution report — n converted, exact-decimal mean
    // --- hours, exact interpolated median hours. Two min-aggregations and
    // --- one join on the user key; the funnel q54 counts reach, this
    // --- measures HOW LONG the step takes. ------------------------------
    q("q80_conversion_latency",
      """WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT v.user_id, MIN(e.ts) AS t1
        |  FROM v JOIN events e ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.t0 GROUP BY 1),
        |lat AS (SELECT v.user_id,
        |  CAST(epoch_us(p.t1) - epoch_us(v.t0) AS BIGINT) AS us
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id)
        |SELECT COUNT(*) AS n_viewers,
        |  CAST(COUNT(us) AS BIGINT) AS n_converted,
        |  CAST(SUM(CAST(us AS DECIMAL(18,0))) AS DOUBLE)/COUNT(us)/3600e6 AS mean_hours,
        |  quantile_cont(us, 0.5)/3600e6 AS median_hours
        |FROM lat""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
        .join(v, Seq("user_id"))
        .filter(col("pts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("pts")).as("t1"))
      val lat = v.join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (unix_micros(col("t1")) - unix_micros(col("t0"))).as("us"))
      lat.agg(count(lit(1)).as("n_viewers"),
          count(col("us")).as("n_converted"),
          (sum(col("us").cast(DecimalType(18, 0))).cast("double")
            / count(col("us")) / lit(3600e6)).as("mean_hours"),
          (expr("percentile(us, 0.5)") / lit(3600e6)).as("median_hours"))
    },

    // --- session journey analysis (q81): the top session PATHS — each
    // --- q35 session rendered as its ordered event-type string, counted,
    // --- top-5 by frequency (ties lexicographic). The product-analytics
    // --- view of "what do sessions look like". Journey assembly is
    // --- array_sort over collected (t, id, type) structs (collect order
    // --- never matters); the rank runs over the journey-count frame,
    // --- bounded by distinct paths, never events. ------------------------
    q("q81_session_journeys",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |    OR t_us - lag(t_us) OVER w > 7200000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |t AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM s),
        |j AS (SELECT user_id, session_no,
        |  string_agg(event_type, '>' ORDER BY t_us, event_id) AS journey
        |  FROM t GROUP BY 1, 2),
        |c AS (SELECT journey, COUNT(*) AS n_sessions FROM j GROUP BY 1)
        |SELECT journey, n_sessions, CAST(rk AS BIGINT) AS rank FROM (
        |  SELECT journey, n_sessions, ROW_NUMBER() OVER (
        |    ORDER BY n_sessions DESC, journey) AS rk FROM c) z
        |WHERE rk <= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("t_us"))
      val j = graft.operators.Sessionize.assign(ev, Seq("user_id"),
          col("t_us"), Seq(col("event_id")), gap = 7200L * 1000000L)
        .groupBy(col("user_id"), col("session_no"))
        .agg(concat_ws(">", expr(
          "transform(array_sort(collect_list(struct(t_us, event_id, event_type))), p -> p.event_type)"))
          .as("journey"))
      // top-5 via TakeOrderedAndProject over the O(distinct journeys) frame,
      // then rank the 5 survivors bucket-partitioned (GlobalRank) — never a
      // global rank window
      graft.operators.GlobalRank.rowNumber(
        j.groupBy(col("journey")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("journey")).limit(5),
        Seq(col("n_sessions").desc, col("journey")), "rank", nBuckets = 4)
    },

    // --- interval union / coverage (q82): each event opens a 30-minute
    // --- activity window; overlapping windows per user MERGE into maximal
    // --- covered intervals (the running-max-end gaps-and-islands trick —
    // --- an island starts where the window start clears everything seen
    // --- before it). Reports per user the merged-interval count and the
    // --- exact covered microseconds — the machine-utilization / SLA-
    // --- coverage computation. ONE user-keyed exchange carries both
    // --- windows and the rollup; all integer math. -----------------------
    q("q82_interval_coverage",
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
        |  epoch_us(ts) + 1800000000 AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |  MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv),
        |isl AS (SELECT user_id, s, e,
        |  CAST(SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS island
        |  FROM m),
        |g AS (SELECT user_id, island, MIN(s) AS is_, MAX(e) AS ie
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  CAST(SUM(ie - is_) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val iv = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 1800000000L).as("e"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
      val m = iv.withColumn("prev_max",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      val isl = m.withColumn("island",
        sum(when(col("prev_max").isNull || col("s") > col("prev_max"), 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      isl.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("is_"), max(col("e")).as("ie"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("ie") - col("is_")).as("covered_us"))
    },

    // --- OHLC downsampling (q83): per (event_type, day) the open / high /
    // --- low / close of `value` — the time-series bar compression every
    // --- metrics store runs. Open/close are min_by/max_by on the total
    // --- (ts, event_id) order (partial-agg'd — never a window sort over
    // --- the raw series); high/low plain min/max; ONE aggregation. -------
    q("q83_ohlc_bars",
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  arg_min(value, (epoch_us(ts) - 1704067200000000)*1000000 + event_id) AS open_v,
        |  MAX(value) AS high_v, MIN(value) AS low_v,
        |  arg_max(value, (epoch_us(ts) - 1704067200000000)*1000000 + event_id) AS close_v,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("value"),
          ((unix_micros(col("ts")) - 1704067200000000L) * 1000000L
            + col("event_id")).as("_k"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          min_by(col("value"), col("_k")).as("open_v"),
          max(col("value")).as("high_v"), min(col("value")).as("low_v"),
          max_by(col("value"), col("_k")).as("close_v"),
          count(lit(1)).as("n"))
    },

    // --- churn triad (q84): users RETAINED / CHURNED / NEW between the
    // --- first and second half of the month — the retention report every
    // --- growth dashboard opens with. Two distinct user sets, one
    // --- full-outer membership join, three conditional counts; all
    // --- partial-agg'd, output one row. ----------------------------------
    q("q84_churn_triad",
      """WITH p1 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |p2 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |m AS (SELECT p1.user_id AS u1, p2.user_id AS u2
        |  FROM p1 FULL JOIN p2 ON p1.user_id = p2.user_id)
        |SELECT
        |  CAST(SUM(CASE WHEN u1 IS NOT NULL AND u2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |  CAST(SUM(CASE WHEN u1 IS NOT NULL AND u2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS churned,
        |  CAST(SUM(CASE WHEN u1 IS NULL AND u2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        |FROM m""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val p1 = ev.filter(col("ts") < cut).select(col("user_id").as("u1")).distinct()
      val p2 = ev.filter(col("ts") >= cut).select(col("user_id").as("u2")).distinct()
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      p1.join(p2, col("u1") === col("u2"), "full_outer")
        .agg(cnt(col("u1").isNotNull && col("u2").isNotNull).as("retained"),
          cnt(col("u1").isNotNull && col("u2").isNull).as("churned"),
          cnt(col("u1").isNull && col("u2").isNotNull).as("new_users"))
    },

    // --- ABC / Pareto analysis (q85): customers classed A (first 80% of
    // --- revenue), B (next 15%), C (tail) by cumulative revenue share —
    // --- the inventory-management classic. Revenue per customer is one
    // --- partial-agg'd decimal aggregation; rank/cumsum windows run on
    // --- the per-customer frame; class boundaries are exact integer-
    // --- scaled decimal cross-multiplications (cum·100 vs pct·total — no
    // --- division anywhere). Ties rank (revenue DESC, custkey). ----------
    q("q85_abc_analysis",
      """WITH rev AS (SELECT o_custkey,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r FROM orders GROUP BY 1),
        |rk AS (SELECT o_custkey, r,
        |  SUM(r) OVER (ORDER BY r DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS cum,
        |  SUM(r) OVER () AS tot FROM rev),
        |cls AS (SELECT o_custkey,
        |  CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |       WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc,
        |  r FROM rk)
        |SELECT abc, COUNT(*) AS n_customers,
        |  CAST(SUM(r) AS DOUBLE) AS revenue
        |FROM cls GROUP BY 1""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("r"))
      // global cumulative revenue via the two-level prefix sum (GlobalRank):
      // exact decimal arithmetic end-to-end, never a single-partition window
      // over the per-customer frame (15 M rows at sf100); tot is the grand
      // total literal from the same bucket-totals pass
      val rk = graft.operators.GlobalRank.cumSum(rev,
        Seq(col("r").desc, col("o_custkey")), col("r"), "cum",
        totalCol = Some("tot"))
      rk.select(col("o_custkey"), col("r"),
          when(col("cum") * 100 <= col("tot") * 80, "A")
            .when(col("cum") * 100 <= col("tot") * 95, "B")
            .otherwise("C").as("abc"))
        .groupBy(col("abc"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("r")).cast("double").as("revenue"))
    },

    // --- event-sequence conformance audit (q86): state-machine rules over
    // --- each user's ordered stream — 'first event must be signup' and
    // --- 'no purchase before a view' — reported as per-rule violating-user
    // --- counts. Each rule is one per-user min-aggregation compared in
    // --- plan (no per-user subquery, no ordered event list materialized);
    // --- the protocol-conformance check an event pipeline runs at ingest.
    q("q86_sequence_audit",
      """WITH f AS (SELECT user_id,
        |  arg_min(event_type, (epoch_us(ts) - 1704067200000000)*1000000 + event_id)
        |    AS first_type FROM events GROUP BY 1),
        |r1 AS (SELECT COUNT(*) AS n FROM f WHERE first_type <> 'signup'),
        |pv AS (SELECT user_id,
        |  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_p,
        |  MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_v
        |  FROM events GROUP BY 1),
        |r2 AS (SELECT COUNT(*) AS n FROM pv
        |  WHERE t_p IS NOT NULL AND (t_v IS NULL OR t_p < t_v))
        |SELECT 'first_not_signup' AS rule, n AS n_violating_users FROM r1
        |UNION ALL SELECT 'purchase_before_view', n FROM r2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val key = (unix_micros(col("ts")) - 1704067200000000L) * 1000000L +
        col("event_id")
      val r1 = ev.select(col("user_id"), col("event_type"), key.as("_k"))
        .groupBy(col("user_id"))
        .agg(min_by(col("event_type"), col("_k")).as("first_type"))
        .filter(col("first_type") =!= "signup")
        .agg(count(lit(1)).as("n_violating_users"))
        .select(lit("first_not_signup").as("rule"), col("n_violating_users"))
      val r2 = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("t_p"),
          min(when(col("event_type") === "view",
            unix_micros(col("ts")))).as("t_v"))
        .filter(col("t_p").isNotNull &&
          (col("t_v").isNull || col("t_p") < col("t_v")))
        .agg(count(lit(1)).as("n_violating_users"))
        .select(lit("purchase_before_view").as("rule"),
          col("n_violating_users"))
      r1.unionByName(r2)
    },

    // --- period-over-period change (q87): weekly revenue with
    // --- week-over-week absolute and relative deltas — the growth
    // --- dashboard's first chart. One decimal aggregation to the weekly
    // --- frame; the lag window and both deltas run on O(weeks) rows
    // --- (exact decimal subtraction, one IEEE ratio). --------------------
    q("q87_wow_change",
      """WITH wk AS (SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT week, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE) AS wow_delta,
        |  CAST(rev - lag(rev) OVER (ORDER BY week) AS DOUBLE)
        |    / CAST(lag(rev) OVER (ORDER BY week) AS DOUBLE) AS wow_pct
        |FROM wk""".stripMargin) { (s, d) =>
      val wk = Tables.orders(s, d)
        .groupBy(date_trunc("week", col("o_orderdate")).as("week"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      // lag via GlobalRank.lag1 (bucket-local lag + one handoff row per
      // bucket) — the week frame is calendar-bounded, but the uniform
      // two-level form keeps every ordered window off the single-partition
      // path
      graft.operators.GlobalRank.lag1(wk, "week", col("rev"), "_prev")
        .select(col("week"), col("rev").cast("double").as("revenue"),
          (col("rev") - col("_prev")).cast("double").as("wow_delta"),
          ((col("rev") - col("_prev")).cast("double")
            / col("_prev").cast("double")).as("wow_pct"))
    },

    // --- skyline / Pareto frontier (q88): parts not DOMINATED on (price ↓
    // --- better, size ↑ better) — the multi-criteria shortlist operator.
    // --- Scale shape: dedupe to distinct (price, size) pairs, sort them
    // --- (price ASC, size DESC) and keep a pair iff the running max size
    // --- over its predecessors is below its own — every predecessor is
    // --- cheaper-or-equal-with-bigger-size, so rmax ≥ size ⇔ dominated;
    // --- the sort runs over DISTINCT pairs, not parts (and shards by
    // --- price range at 100 TB — local skylines merge). The ORACLE is the
    // --- textbook NOT EXISTS dominance test — an independent formulation
    // --- cross-checking the window trick's semantics. --------------------
    q("q88_skyline",
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val pairs = parts.select(col("p_retailprice"), col("p_size")).distinct()
      // exclusive running max over the O(distinct pairs) frame via
      // GlobalRank.cumMax (per-bucket running max + driver prefix-max of
      // O(nBuckets) bucket maxima) — the frontier sweep never
      // single-partitions the pair frame
      val frontier = graft.operators.GlobalRank.cumMax(pairs,
          Seq(col("p_retailprice"), col("p_size").desc), col("p_size"), "_rm",
          exclusive = true)
        .filter(col("_rm").isNull || col("_rm") < col("p_size"))
        .select(col("p_retailprice"), col("p_size"))
      parts.join(frontier, Seq("p_retailprice", "p_size"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    },

    // --- audience overlap matrix (q89): |users(a) ∩ users(b)| and Jaccard
    // --- for every event-type pair — the segment-overlap view an audience
    // --- platform serves. Distinct (type, user) pairs ONCE (partial-
    // --- agg'd), intersections via one self-equi-join on user, sizes
    // --- joined back from a tiny per-type count; Jaccard by
    // --- inclusion–exclusion, one IEEE divide of exact integers. ---------
    q("q89_audience_overlap",
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        |sz AS (SELECT t, COUNT(*) AS n FROM tu GROUP BY 1),
        |ov AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_common
        |  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT ov.ta, ov.tb, ov.n_common,
        |  CAST(ov.n_common AS DOUBLE)
        |    / (sa.n + sb.n - ov.n_common) AS jaccard
        |FROM ov JOIN sz sa ON ov.ta = sa.t JOIN sz sb ON ov.tb = sb.t""".stripMargin) { (s, d) =>
      val tu = Tables.events(s, d)
        .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
      val sz = tu.groupBy(col("t")).agg(count(lit(1)).as("n"))
      val ov = tu.select(col("t").as("ta"), col("u"))
        .join(tu.select(col("t").as("tb"), col("u")), Seq("u"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_common"))
      ov.join(broadcast(sz.select(col("t").as("ta"), col("n").as("_na"))), Seq("ta"))
        .join(broadcast(sz.select(col("t").as("tb"), col("n").as("_nb"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("n_common"),
          (col("n_common").cast("double")
            / (col("_na") + col("_nb") - col("n_common"))).as("jaccard"))
    },

    // --- BOM explosion / weighted rollup (q90): q51's supplier heap tree
    // --- with a per-edge quantity — effective units of each descendant in
    // --- an assembly is the PRODUCT of quantities along the path (the
    // --- "how many screws in the airplane" query). Path doubling carries
    // --- the product (⌈log₂ depth⌉ joins; forest ⇒ one path per pair, no
    // --- same-pair sum needed); all integer-exact. Oracle = the literal
    // --- one-step WITH RECURSIVE multiplying as it descends. -------------
    q("q90_bom_explosion",
      """WITH RECURSIVE pairs(anc, node, w) AS (
        |  SELECT s_suppkey, s_suppkey, CAST(1 AS BIGINT) FROM supplier
        |  UNION ALL
        |  SELECT p.anc, s.s_suppkey, p.w * (s.s_suppkey % 5 + 1) FROM pairs p
        |  JOIN supplier s ON s.s_suppkey >= 1 AND (s.s_suppkey - 1) // 2 = p.node)
        |SELECT anc AS node, COUNT(*) AS n_desc,
        |  CAST(SUM(w) AS BIGINT) AS total_units
        |FROM pairs GROUP BY 1""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val edges = sup.filter(col("s_suppkey") >= 1)
        .select(col("s_suppkey").as("child"),
          expr("(s_suppkey - 1) div 2").cast("long").as("parent"),
          (col("s_suppkey") % 5 + 1).as("qty"))
      graft.operators.Hierarchy.weightedRollup(sup, edges,
        "s_suppkey", "child", "parent", "qty")
    },

    // --- linear multi-touch attribution (q91): each purchase's credit is
    // --- split EQUALLY across every click/view in its 24h lookback (q66
    // --- gave the whole conversion to the last touch; linear is the other
    // --- standard model). (purchase, touch) pairs come from the bounded
    // --- interval join (state O(rate·lookback), the cdc15 shape); the
    // --- per-purchase fan-out count rides one partial-agg'd groupBy; each
    // --- 1/n credit is one IEEE divide cast to decimal so the final sums
    // --- are order-proof. ------------------------------------------------
    q("q91_linear_attribution",
      """WITH p AS (SELECT user_id, event_id AS pid, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS tid, event_type AS ttype, ts AS tts
        |  FROM events WHERE event_type IN ('click', 'view')),
        |pairs AS (SELECT p.pid, t.ttype FROM p JOIN t
        |  ON p.user_id = t.user_id
        |  AND t.tts >= p.pts - INTERVAL 24 HOUR AND t.tts <= p.pts),
        |n AS (SELECT pid, COUNT(*) AS n_t FROM pairs GROUP BY 1)
        |SELECT pairs.ttype AS touch, COUNT(*) AS n_touches,
        |  CAST(SUM(CAST(1.0 / n.n_t AS DECIMAL(18,12))) AS DOUBLE) AS credit
        |FROM pairs JOIN n ON pairs.pid = n.pid
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("ttype"),
          col("ts").as("tts"))
      val pairs = p.join(t, Seq("user_id"))
        .filter(col("tts") >= col("pts") - expr("INTERVAL 24 HOURS") &&
          col("tts") <= col("pts"))
        .select(col("pid"), col("ttype"))
      val n = pairs.groupBy(col("pid")).agg(count(lit(1)).as("n_t"))
      pairs.join(n, Seq("pid"))
        .groupBy(col("ttype").as("touch"))
        .agg(count(lit(1)).as("n_touches"),
          sum((lit(1.0) / col("n_t")).cast(DecimalType(18, 12)))
            .cast("double").as("credit"))
    },

    // --- hierarchical contribution (q92): each node's share of its
    // --- PARENT's subtree value — the drill-down percentage a hierarchy
    // --- dashboard shows at every level. Rides q51's closure rollup (the
    // --- expensive part, already O(nodes·depth)); the share is one
    // --- parent-edge self-join + an IEEE divide of the exact decimal
    // --- subtree sums. Roots carry share 1.0 of themselves. --------------
    q("q92_hierarchy_contribution",
      """WITH RECURSIVE pairs(anc, node) AS (
        |  SELECT s_suppkey, s_suppkey FROM supplier
        |  UNION ALL
        |  SELECT p.anc, s.s_suppkey FROM pairs p
        |  JOIN supplier s ON s.s_suppkey >= 1 AND (s.s_suppkey - 1) // 2 = p.node),
        |down AS (SELECT anc, CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS subtree_val
        |  FROM pairs JOIN supplier ON node = s_suppkey GROUP BY anc)
        |SELECT c.s_suppkey AS node,
        |  CASE WHEN c.s_suppkey = 0 THEN CAST(1.0 AS DOUBLE)
        |       ELSE dc.subtree_val / dp.subtree_val END AS share_of_parent
        |FROM supplier c
        |JOIN down dc ON dc.anc = c.s_suppkey
        |LEFT JOIN down dp ON c.s_suppkey >= 1
        |  AND dp.anc = (c.s_suppkey - 1) // 2""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val edges = sup.filter(col("s_suppkey") >= 1)
        .select(col("s_suppkey").as("child"),
          expr("(s_suppkey - 1) div 2").cast("long").as("parent"))
      val down = graft.operators.Hierarchy.rollup(sup, edges,
          "s_suppkey", "s_acctbal", "child", "parent")
        .select(col("node"), col("subtree_val"))
      sup.select(col("s_suppkey").as("node"),
          expr("(s_suppkey - 1) div 2").cast("long").as("_parent"))
        .join(down, Seq("node"))
        .join(down.select(col("node").as("_parent"),
          col("subtree_val").as("_pval")), Seq("_parent"), "left")
        .select(col("node"),
          when(col("node") === 0, lit(1.0))
            .otherwise(col("subtree_val") / col("_pval"))
            .as("share_of_parent"))
    },

    // --- session bounce rate (q93): sessions with exactly one event,
    // --- reported per ENTRY event type (what did bouncers land on?) —
    // --- the engagement metric beside q81's journeys. Session assembly
    // --- rides q35's one user-keyed exchange; entry type and size are one
    // --- grouped min_by/count; the rate one IEEE divide. -----------------
    q("q93_bounce_rate",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
        |  FROM events),
        |s AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |    OR t_us - lag(t_us) OVER w > 7200000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |t AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM s),
        |g AS (SELECT user_id, session_no,
        |  arg_min(event_type, (t_us - 1704067200000000)*1000000 + event_id) AS entry_type,
        |  COUNT(*) AS n_events
        |  FROM t GROUP BY 1, 2)
        |SELECT entry_type, COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS bounce_rate
        |FROM g GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("t_us"))
      val g = graft.operators.Sessionize.assign(ev, Seq("user_id"),
          col("t_us"), Seq(col("event_id")), gap = 7200L * 1000000L)
        .groupBy(col("user_id"), col("session_no"))
        .agg(min_by(col("event_type"),
          (col("t_us") - 1704067200000000L) * 1000000L + col("event_id"))
          .as("entry_type"), count(lit(1)).as("n_events"))
      g.groupBy(col("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_rate",
          col("n_bounces").cast("double") / col("n_sessions"))
    },

    // --- Gini dispersion (q94): revenue inequality per order status via
    // --- the sorted-rank formulation G = Σ(2r−n−1)x / (n·Σx) — exact
    // --- integer×decimal products (values at scale 1 keep the unscaled
    // --- sum < 2^53, the q65 double-rounding discipline), one IEEE divide
    // --- at the end. Ties rank by order key — identical total order both
    // --- engines, so the statistic hash-matches. The rank window runs per
    // --- status partition (a rank statistic needs the order; at scale the
    // --- partition key is whatever slices the analysis). ------------------
    q("q94_gini",
      """WITH r AS (SELECT o_orderstatus AS st,
        |  CAST(o_totalprice AS DECIMAL(12,1)) AS x,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS rk,
        |  COUNT(*) OVER (PARTITION BY o_orderstatus) AS n FROM orders)
        |SELECT st, CAST(MIN(n) AS BIGINT) AS n,
        |  CAST(SUM((2*rk - n - 1) * x) AS DOUBLE)
        |    / (CAST(MIN(n) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS gini
        |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val r = Tables.orders(s, d).select(col("o_orderstatus").as("st"),
        col("o_totalprice").cast(DecimalType(12, 1)).as("x"),
        row_number().over(w).as("rk"),
        count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))).as("n"))
      r.groupBy(col("st"))
        .agg(min(col("n")).as("n"),
          (sum((lit(2) * col("rk") - col("n") - 1) * col("x")).cast("double")
            / (min(col("n")).cast("double") * sum(col("x")).cast("double")))
            .as("gini"))
    },

    // --- cumulative audience curve (q95): per day, NEW users (first-seen
    // --- that day) and the exact cumulative distinct audience to date —
    // --- the growth curve COUNT(DISTINCT) OVER cannot express without
    // --- re-scanning per day. First-touch reduces each user to ONE row
    // --- (partial-agg'd min), the cumsum runs on the O(days) frame. -----
    q("q95_cumulative_audience",
      """WITH ft AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
        |  FROM events GROUP BY 1),
        |nd AS (SELECT d0 AS day, COUNT(*) AS new_users FROM ft GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cumulative_users
        |FROM nd""".stripMargin) { (s, d) =>
      val nd = Tables.events(s, d)
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      // running total via GlobalRank's two-level prefix sum — bucket-local
      // windows over the day frame, no single-partition move
      graft.operators.GlobalRank.cumSum(nd, Seq(col("day")),
        col("new_users"), "cumulative_users", nBuckets = 8)
    },

    // --- first/nth_value window surface (q96): per status, the top price
    // --- and the 2nd/3rd highest via nth_value over the full-partition
    // --- frame — the remaining value-window functions (q11 ranks rows,
    // --- q12 lags them; this reads specific positions). Total (price
    // --- DESC, key) order makes every position deterministic; one row per
    // --- status via DISTINCT. --------------------------------------------
    q("q96_nth_value",
      """SELECT DISTINCT o_orderstatus,
        |  first_value(o_totalprice) OVER w AS top_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderstatus"),
          first(col("o_totalprice")).over(w).as("top_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
          nth_value(col("o_totalprice"), 3).over(w).as("third_price"))
        .distinct()
    },

    // --- one-to-one reconciliation matching (q97): pair click events with
    // --- purchase events of the same (user, value) EXACTLY once each —
    // --- the payments-matching shape (a duplicate on one side must not
    // --- absorb two partners). The standard row_number pairing: each side
    // --- ranks its duplicates within the match key, the join adds rn to
    // --- the key, leftovers on either side surface as unmatched. One
    // --- keyed window per side + one equi-join; report one row. ----------
    q("q97_one_to_one_match",
      """WITH l AS (SELECT user_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, value ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, value ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT l.user_id FROM l JOIN r
        |  ON l.user_id = r.user_id AND l.value = r.value AND l.rn = r.rn),
        |c AS (SELECT (SELECT COUNT(*) FROM m) AS n_matched,
        |  (SELECT COUNT(*) FROM l) AS nl, (SELECT COUNT(*) FROM r) AS nr)
        |SELECT n_matched, nl - n_matched AS n_left_only,
        |  nr - n_matched AS n_right_only FROM c""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      def side(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("value"),
          row_number().over(Window.partitionBy(col("user_id"), col("value"))
            .orderBy(col("event_id"))).as("rn"))
      val l = side("click")
      val r = side("purchase")
      val m = l.join(r, Seq("user_id", "value", "rn"))
        .agg(count(lit(1)).as("n_matched"))
      val nl = l.agg(count(lit(1)).as("nl"))
      val nr = r.agg(count(lit(1)).as("nr"))
      m.crossJoin(nl).crossJoin(nr)
        .select(col("n_matched"),
          (col("nl") - col("n_matched")).as("n_left_only"),
          (col("nr") - col("n_matched")).as("n_right_only"))
    },

    // --- velocity / burst detection (q98): (user, hour) windows with ≥ 2
    // --- events — the rate-limit / fraud-velocity primitive (N actions
    // --- per key per window). ONE partial-agg'd groupBy on the composite
    // --- key; the threshold filter drops the quiet majority before
    // --- anything materializes. ------------------------------------------
    q("q98_velocity_check",
      """SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
        .filter(col("n_events") >= 2)
    },

    // --- χ² independence statistic (q99): is order status associated with
    // --- priority? The contingency-table test feature selection and A/B
    // --- sanity checks run. Observed counts are exact integers; expected
    // --- = row·col/total and each cell's (o−e)²/e are a handful of IEEE
    // --- ops — identical on both engines. One groupBy for cells, tiny
    // --- broadcast margins; dof = (r−1)(c−1) exact. ----------------------
    q("q99_chi_square",
      """WITH cell AS (SELECT o_orderstatus AS r, o_orderpriority AS c,
        |  COUNT(*) AS o FROM orders GROUP BY 1, 2),
        |rm AS (SELECT r, SUM(o) AS nr FROM cell GROUP BY 1),
        |cm AS (SELECT c, SUM(o) AS nc FROM cell GROUP BY 1),
        |tot AS (SELECT SUM(o) AS n FROM cell),
        |x AS (SELECT cell.r, cell.c, cell.o,
        |  CAST(rm.nr AS DOUBLE) * CAST(cm.nc AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
        |  FROM cell JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot)
        |SELECT CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(18,10))) AS DOUBLE) AS chi2,
        |  CAST(((SELECT COUNT(*) FROM rm) - 1) * ((SELECT COUNT(*) FROM cm) - 1) AS BIGINT) AS dof,
        |  CAST((SELECT n FROM tot) AS BIGINT) AS n
        |FROM x""".stripMargin) { (s, d) =>
      val cell = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("r"), col("o_orderpriority").as("c"))
        .agg(count(lit(1)).as("o"))
      val rm = cell.groupBy(col("r")).agg(sum(col("o")).as("nr"))
      val cm = cell.groupBy(col("c")).agg(sum(col("o")).as("nc"))
      val tot = cell.agg(sum(col("o")).as("n"))
      val nrm = rm.agg(count(lit(1)).as("_r"))
      val ncm = cm.agg(count(lit(1)).as("_c"))
      val x = cell.join(broadcast(rm), Seq("r")).join(broadcast(cm), Seq("c"))
        .crossJoin(broadcast(tot))
        .select(col("o"),
          (col("nr").cast("double") * col("nc").cast("double")
            / col("n").cast("double")).as("e"), col("n"))
      x.agg(
          sum(((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
            .cast(DecimalType(18, 10))).cast("double").as("chi2"),
          min(col("n")).as("_n"))
        .crossJoin(broadcast(nrm)).crossJoin(broadcast(ncm))
        .select(col("chi2"),
          ((col("_r") - 1) * (col("_c") - 1)).as("dof"),
          col("_n").as("n"))
    },

    // --- double-charge audit (q100): orders sharing (customer, day,
    // --- exact total) — the duplicate-billing detector finance teams run
    // --- nightly (a legitimate reorder rarely repeats to the cent on the
    // --- same day). One composite-key groupBy, suspects only (HAVING >1),
    // --- the min/max order keys name the pair to investigate. ------------
    q("q100_double_charge",
      """WITH o AS (SELECT * FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 131 = 0)
        |SELECT o_custkey, CAST(o_orderdate AS DATE) AS day, o_totalprice,
        |  COUNT(*) AS n_orders,
        |  MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |FROM o GROUP BY 1, 2, 3 HAVING COUNT(*) > 1""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val o = orders.unionByName(orders.filter(col("o_orderkey") % 131 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      o.groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
          col("o_totalprice"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("first_key"),
          max(col("o_orderkey")).as("last_key"))
        .filter(col("n_orders") > 1)
    },

    // --- inter-purchase intervals (q101): per customer the gaps between
    // --- consecutive orders, rolled into the repeat-purchase distribution
    // --- (n repeaters, mean and exact p50/p90 gap days) — the retention-
    // --- depth metric behind "how often do customers come back". One
    // --- customer-keyed lag window; the percentile runs on the O(gaps)
    // --- frame; day arithmetic exact integers. ---------------------------
    q("q101_purchase_intervals",
      """WITH g AS (SELECT o_custkey,
        |  CAST(CAST(o_orderdate AS DATE)
        |    - CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS DATE) AS BIGINT) AS gap_days
        |  FROM orders)
        |SELECT COUNT(gap_days) AS n_gaps,
        |  COUNT(DISTINCT CASE WHEN gap_days IS NOT NULL THEN o_custkey END)
        |    AS n_repeat_customers,
        |  CAST(SUM(gap_days) AS DOUBLE)/COUNT(gap_days) AS mean_gap_days,
        |  quantile_cont(gap_days, 0.5) AS p50_gap_days,
        |  quantile_cont(gap_days, 0.9) AS p90_gap_days
        |FROM g""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val g = Tables.orders(s, d).select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).cast("long")
          .as("gap_days"))
      g.agg(count(col("gap_days")).as("n_gaps"),
        countDistinct(when(col("gap_days").isNotNull, col("o_custkey")))
          .as("n_repeat_customers"),
        (sum(col("gap_days")).cast("double") / count(col("gap_days")))
          .as("mean_gap_days"),
        expr("percentile(gap_days, 0.5)").as("p50_gap_days"),
        expr("percentile(gap_days, 0.9)").as("p90_gap_days"))
    },

    // --- market-basket association rules (q102): directed part→part rules
    // --- over order baskets (1-in-10 part slice) with support, confidence
    // --- and lift — the retail twin of txt52's token collocations, on
    // --- BASKETS instead of documents. Pair counting is one order
    // --- self-join bounded by basket width; item/basket counts broadcast;
    // --- every metric an IEEE ratio of exact integers; min-support ≥ 3
    // --- and lift ≥ 1.2 keep the report to real signal. -------------------
    q("q102_basket_rules",
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM li),
        |ic AS (SELECT p, COUNT(*) AS n_p FROM li GROUP BY 1),
        |pr AS (SELECT a.p AS ante, b.p AS cons, COUNT(*) AS n_pair
        |  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
        |  GROUP BY 1, 2)
        |SELECT pr.ante, pr.cons, pr.n_pair,
        |  CAST(pr.n_pair AS DOUBLE) / nb.n_baskets AS support,
        |  CAST(pr.n_pair AS DOUBLE) / ia.n_p AS confidence,
        |  CAST(pr.n_pair AS DOUBLE) * nb.n_baskets / (ia.n_p * ic2.n_p) AS lift
        |FROM pr JOIN ic ia ON pr.ante = ia.p JOIN ic ic2 ON pr.cons = ic2.p
        |CROSS JOIN nb
        |WHERE pr.n_pair >= 3
        |  AND CAST(pr.n_pair AS DOUBLE) * nb.n_baskets / (ia.n_p * ic2.n_p) >= 1.2""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val nb = li.agg(countDistinct(col("o")).as("n_baskets"))
      val ic = li.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
      val pr = li.alias("a").join(li.alias("b"),
          col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
        .groupBy(col("a.p").as("ante"), col("b.p").as("cons"))
        .agg(count(lit(1)).as("n_pair"))
      val lift = col("n_pair").cast("double") * col("n_baskets") /
        (col("_na") * col("_nc"))
      pr.join(broadcast(ic.select(col("p").as("ante"), col("n_p").as("_na"))),
          Seq("ante"))
        .join(broadcast(ic.select(col("p").as("cons"), col("n_p").as("_nc"))),
          Seq("cons"))
        .crossJoin(broadcast(nb))
        .filter(col("n_pair") >= 3 && lift >= 1.2)
        .select(col("ante"), col("cons"), col("n_pair"),
          (col("n_pair").cast("double") / col("n_baskets")).as("support"),
          (col("n_pair").cast("double") / col("_na")).as("confidence"),
          lift.as("lift"))
    },

    // --- windowed debounce / throttle (q103): keep only the FIRST event
    // --- per (user, type) per hour — the notification-throttling /
    // --- event-debounce primitive (send at most one alert per key per
    // --- window). One composite-key window ranked by the total (ts, id)
    // --- order; everything else drops before materializing. The streaming
    // --- twin is dropDuplicates on (key, window) — cdc16's machinery. ----
    q("q103_debounce",
      """SELECT user_id, event_type,
        |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_id
        |FROM (SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type, date_trunc('hour', ts)
        |    ORDER BY ts, event_id) AS rn FROM events) t
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("hour"), col("event_id"))
    },

    // --- ROLLUP with GROUPING() labels (q104): revenue by (year, month)
    // --- with each subtotal level NAMED via the grouping indicator — the
    // --- piece q20's ROLLUP left implicit (a consumer can't tell a real
    // --- NULL month from the year-subtotal row without GROUPING()). One
    // --- Expand-based aggregation, labels pure projection. ---------------
    q("q104_rollup_labeled",
      """SELECT
        |  CASE WHEN GROUPING(yr) = 1 THEN 'grand_total'
        |       WHEN GROUPING(mon) = 1 THEN 'year_total' ELSE 'month' END AS level,
        |  yr, mon,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mon, o_totalprice FROM orders) t
        |GROUP BY ROLLUP (yr, mon)""".stripMargin) { (s, d) =>
      val t = Tables.orders(s, d).select(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"), col("o_totalprice"))
      t.rollup(col("yr"), col("mon"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"), count(lit(1)).as("n"),
          grouping(col("yr")).as("_gy"), grouping(col("mon")).as("_gm"))
        .select(
          when(col("_gy") === 1, "grand_total")
            .when(col("_gm") === 1, "year_total")
            .otherwise("month").as("level"),
          col("yr"), col("mon"), col("revenue"), col("n"))
    },

    // --- weekend-effect report (q105): weekday vs weekend revenue with
    // --- the per-day-rate lift ratio. Day-of-week via pure integer date
    // --- arithmetic — days since a known Monday mod 7 — because the
    // --- engines' dayofweek() conventions differ (0- vs 1-based); exact
    // --- decimal sums, two IEEE ratios. ----------------------------------
    q("q105_weekend_effect",
      """WITH t AS (SELECT o_totalprice,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '2024-01-01' AS BIGINT) % 7 AS dow
        |  FROM orders),
        |g AS (SELECT CASE WHEN dow IN (5, 6) OR dow IN (-1, -2) THEN 'weekend'
        |    ELSE 'weekday' END AS kind,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM t GROUP BY 1)
        |SELECT kind, n, revenue,
        |  revenue / n AS revenue_per_order
        |FROM g""".stripMargin) { (s, d) =>
      val t = Tables.orders(s, d).select(col("o_totalprice"),
        (datediff(to_date(col("o_orderdate")), lit("2024-01-01").cast("date"))
          .cast("long") % 7).as("dow"))
      t.groupBy(when(col("dow").isin(5, 6, -1, -2), "weekend")
          .otherwise("weekday").as("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"))
        .withColumn("revenue_per_order", col("revenue") / col("n"))
    },

    // --- new-vs-repeat revenue decomposition (q106): monthly revenue
    // --- split by whether the order fell on its customer's FIRST order
    // --- date — the acquisition/retention decomposition a finance review
    // --- opens with. First-touch reduces each customer to one partial-
    // --- agg'd min; one broadcast-joined class flag; exact decimal sums
    // --- per (month, class). ---------------------------------------------
    q("q106_new_repeat_revenue",
      """WITH ft AS (SELECT o_custkey, MIN(o_orderdate) AS d0
        |  FROM orders GROUP BY 1)
        |SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
        |  CASE WHEN o.o_orderdate = ft.d0 THEN 'new' ELSE 'repeat' END AS kind,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN ft ON o.o_custkey = ft.o_custkey
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val ft = o.groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("d0"))
      o.join(ft, Seq("o_custkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
          when(col("o_orderdate") === col("d0"), "new")
            .otherwise("repeat").as("kind"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"))
    },

    // --- fulfillment SLA percentiles (q107): days from order to LAST line
    // --- shipment, per priority — the service-level report that tells
    // --- whether 'URGENT' actually ships faster. Fact-to-fact join on the
    // --- order key (both sides would bucket on it persisted — q53's
    // --- layout); per-order max-ship partial-aggregates BEFORE the join
    // --- back; exact integer day math, portable percentiles. -------------
    q("q107_fulfillment_sla",
      """WITH ls AS (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT o.o_orderpriority,
        |  CAST(ls.last_ship - CAST(o.o_orderdate AS DATE) AS BIGINT) AS days
        |  FROM orders o JOIN ls ON o.o_orderkey = ls.l_orderkey)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  quantile_cont(days, 0.5) AS p50_days,
        |  quantile_cont(days, 0.9) AS p90_days,
        |  CAST(MAX(days) AS BIGINT) AS max_days
        |FROM f GROUP BY 1""".stripMargin) { (s, d) =>
      val ls = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      Tables.orders(s, d)
        .join(ls, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("last_ship"), to_date(col("o_orderdate")))
            .cast("long").as("days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(days, 0.5)").as("p50_days"),
          expr("percentile(days, 0.9)").as("p90_days"),
          max(col("days")).as("max_days"))
    },

    // --- customer-value decile table (q108): customers ranked by total
    // --- revenue, cut into deciles (integer cross-multiplied — the q85/
    // --- txt67 discipline), per-decile customer count, revenue, and
    // --- revenue share — the LTV concentration view ("the top decile is
    // --- X% of revenue"). One decimal aggregation per customer; rank and
    // --- cuts on the per-customer frame. ---------------------------------
    q("q108_value_deciles",
      """WITH rev AS (SELECT o_custkey,
        |  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r FROM orders GROUP BY 1),
        |rk AS (SELECT r,
        |  ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS rn,
        |  COUNT(*) OVER () AS n, SUM(r) OVER () AS tot FROM rev)
        |SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(r) AS DOUBLE) AS revenue,
        |  CAST(SUM(r) AS DOUBLE) / CAST(MIN(tot) AS DOUBLE) AS revenue_share
        |FROM rk GROUP BY 1""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("r"))
      // global descending rank + count via GlobalRank (bucket-local windows,
      // O(nBuckets) driver prefix); the grand total is a partial-agg'd
      // scalar broadcast — replaces THREE single-partition windows (rn, n,
      // tot) over the per-customer frame (15 M rows at sf100)
      val tot = rev.agg(sum(col("r")).as("tot"))
      val rk = graft.operators.GlobalRank.rowNumber(rev,
          Seq(col("r").desc, col("o_custkey")), "rn", countCol = Some("n"))
        .crossJoin(broadcast(tot))
        .select(col("r"), col("rn"), col("n"), col("tot"))
      rk.groupBy(expr("(rn - 1) * 10 div n").cast("long").as("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("r")).cast("double").as("revenue"),
          (sum(col("r")).cast("double") / min(col("tot")).cast("double"))
            .as("revenue_share"))
    },

    // --- maximum drawdown (q109): the peak-to-trough statistic over the
    // --- daily net-value series (value - 50 per event as the signed
    // --- daily flow): cumulative sum, running maximum, drawdown = peak −
    // --- cum, max over days — all exact decimals until reporting. One
    // --- aggregation to the O(days) frame, two windows on it. -----------
    q("q109_max_drawdown",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |  SUM(CAST(value AS DECIMAL(18,4)) - 50) AS flow
        |  FROM events GROUP BY 1),
        |c AS (SELECT day, flow,
        |  SUM(flow) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM daily),
        |dd AS (SELECT day, cum,
        |  MAX(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c)
        |SELECT COUNT(*) AS n_days,
        |  CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
        |  CAST(MAX(peak) AS DOUBLE) AS max_peak,
        |  CAST(MIN(cum) AS DOUBLE) AS min_cum
        |FROM dd""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 4)) - 50).as("flow"))
      // cumulative flow, then running peak OF the cumulative — both via
      // GlobalRank two-level passes (exact decimal, bucket-local windows)
      val dd = graft.operators.GlobalRank.cumMax(
        graft.operators.GlobalRank.cumSum(daily, Seq(col("day")),
          col("flow"), "cum", nBuckets = 8),
        Seq(col("day")), col("cum"), "peak", nBuckets = 8)
      dd.agg(count(lit(1)).as("n_days"),
        max(col("peak") - col("cum")).cast("double").as("max_drawdown"),
        max(col("peak")).cast("double").as("max_peak"),
        min(col("cum")).cast("double").as("min_cum"))
    },

    // --- ties-inclusive top-k (q110): ALL parts tying into the 3 highest
    // --- retail prices per brand — rank() ≤ k keeps every tying row where
    // --- q11's row_number() arbitrarily breaks them (the semantics a "top
    // --- 3 prices" business question usually means); output size is
    // --- data-dependent by design. ---------------------------------------
    q("q110_topk_with_ties",
      """SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(rk AS BIGINT) AS price_rank
        |FROM (SELECT *, RANK() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC) AS rk FROM part) t
        |WHERE rk <= 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.part(s, d)
        .withColumn("price_rank", rank().over(
          Window.partitionBy(col("p_brand"))
            .orderBy(col("p_retailprice").desc)).cast("long"))
        .filter(col("price_rank") <= 3)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          col("price_rank"))
    },

    // --- automatic materialized-view matching (q111): q77's summary
    // --- navigation performed BY THE OPTIMIZER — the query is written
    // --- against the FACT table, and the conf-gated SummaryNavigationRewrite
    // --- answers it from the registered (l_returnflag, l_linestatus)
    // --- summary because the grouping is a subset and every aggregate is
    // --- additive. Verdict-as-data: nav_used pins the plan (summary
    // --- scanned, fact NOT scanned); bit_identical compares the rewritten
    // --- result against the rule-off plan (decimal/integral arithmetic —
    // --- exact by construction). Own session, q45's isolation discipline.
    Q("q111_summary_nav_rule", (s, d) => {
      import graft.plans.{SummaryDef, SummaryMeasure, SummaryNavigationRewrite, SummaryRegistry}
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ SummaryNavigationRewrite
      val factPath = s"$d/lineitem.parquet"
      val sumDir = java.nio.file.Files
        .createTempDirectory("q111sum").toString + "/t"
      try {
        SummaryRegistry.build(s2, SummaryDef(factPath, sumDir,
          Seq("l_returnflag", "l_linestatus"),
          Seq(SummaryMeasure("sum_qty", "sum", "l_quantity",
              Some(DecimalType(18, 2))),
            SummaryMeasure("n_rows", "count", ""))))
        def query(sess: SparkSession) = sess.read.parquet(factPath)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty_d"),
            count(lit(1)).as("n"))
        s2.conf.set("spark.graft.summaryNav.enabled", "true")
        val navved = query(s2)
        val scans = navved.queryExecution.optimizedPlan.collect {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
              fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
              _, _, _, _) =>
            fs.location.rootPaths.map(_.toString)
        }.flatten
        val navUsed = scans.exists(_.contains("q111sum")) &&
          !scans.exists(_.contains("lineitem"))
        // force the rewritten plan's execution WHILE the rule is on
        val navRows = navved.localCheckpoint()
        s2.conf.set("spark.graft.summaryNav.enabled", "false")
        val off = query(s2)
        val bitIdentical = Qutil.multisetEq(navRows, off)
        navRows.select(col("l_returnflag"),
          col("sum_qty_d").cast("double").as("sum_qty"), col("n"),
          lit(navUsed).as("nav_used"),
          lit(bitIdentical).as("bit_identical"))
      } finally SummaryRegistry.unregister(factPath)
    }, Some(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n, TRUE AS nav_used, TRUE AS bit_identical
        |FROM lineitem GROUP BY 1""".stripMargin)),

    // --- recursive CTE through the SQL SURFACE (q114): Spark 4 executes
    // --- WITH RECURSIVE natively (UnionLoopExec) — the LITERAL SAME ANSI
    // --- text runs on both engines (the q43 LATERAL discipline), walking
    // --- the supplier heap tree to per-node (depth, root) — the query
    // --- q51 answers with the path-doubling operator, now answered by the
    // --- engine's own recursion. Portable-division form ((x − x%2)/2 is
    // --- exact in doubles) since Spark spells integer division div and
    // --- DuckDB //. Own session: recursion limit conf + the temp view
    // --- must not leak into siblings. ------------------------------------
    {
      val recursiveSql =
        """WITH RECURSIVE walk(node, anc, dist) AS (
          |  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
          |  UNION ALL
          |  SELECT w.node, CAST((w.anc - 1 - ((w.anc - 1) % 2)) / 2 AS BIGINT),
          |    w.dist + 1
          |  FROM walk w WHERE w.anc >= 1)
          |SELECT node, depth, root, n_anc FROM (
          |  SELECT node, dist AS depth, anc AS root, COUNT(*) OVER (PARTITION BY node) AS n_anc,
          |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY dist DESC) AS rn
          |  FROM walk) t WHERE rn = 1""".stripMargin
      q("q114_recursive_cte", recursiveSql) { (s, d) =>
        val s2 = s.newSession()
        Tables.supplier(s2, d).createOrReplaceTempView("supplier")
        s2.sql(recursiveSql)
      }
    },

    // --- VARIANT semi-structured path (q115): Spark 4's Variant type —
    // --- parse_json once, then typed variant_get extraction (the modern
    // --- replacement for per-path get_json_object re-parsing; the binary
    // --- variant encoding is parsed once per row and every path read is
    // --- a cheap traversal). Integer-exact rollup per type; a missing
    // --- path reads NULL (pinned as a count). Oracle = DuckDB's JSON
    // --- extraction of the same paths. -----------------------------------
    q("q115_variant_json",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.absent') IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_absent_null
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("variant_get(parse_json(props), '$.absent', 'long')").as("a"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"),
          sum(when(col("a").isNull, 1L).otherwise(0L)).as("n_absent_null"))
    },

    // --- metadata-only MIN/MAX (q116): optimizer rule #6
    // --- (MetadataMinMaxRewrite) — the companion to q76's footer COUNT.
    // --- An unfiltered MIN/MAX/COUNT over a bare parquet scan folds the
    // --- column-chunk statistics every footer already carries: O(files)
    // --- KBs at plan time instead of a table scan (the `describe table`
    // --- fast path). Verdict-as-data: ok pins that the INT64 rewrite fired
    // --- (LocalRelation in the optimized plan, no scan), that a filtered
    // --- variant stood down (footer stats are wrong under predicates), and
    // --- that STRING extremes stand down (writers may truncate binary
    // --- min/max — parquet.statistics.truncate.length — with no exactness
    // --- flag, so a footer string can be a bound absent from the data);
    // --- string values in the report come from a real scan. Values must
    // --- hash-match DuckDB's real aggregation — bit-identity is the
    // --- rule's contract. ------------------------------------------------
    q("q116_metadata_minmax",
      """SELECT COUNT(*) AS n_rows,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
        |  MIN(o_orderstatus) AS min_status, MAX(o_orderstatus) AS max_status,
        |  MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio,
        |  TRUE AS ok
        |FROM orders""".stripMargin) { (s, d) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.MetadataMinMaxRewrite
      s2.conf.set("spark.graft.metaMinMax.enabled", "true")
      def fired(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        }.nonEmpty
      val agg = Tables.orders(s2, d).agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
        min(col("o_orderstatus")).as("min_status"),
        max(col("o_orderstatus")).as("max_status"),
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"))
      val numericFired = fired(Tables.orders(s2, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key")))
      val stringStoodDown = !fired(Tables.orders(s2, d)
        .agg(min(col("o_orderstatus")).as("m")))
      val filterStoodDown = !fired(Tables.orders(s2, d)
        .filter(col("o_orderkey") % 2 === 0)
        .agg(min(col("o_orderkey")).as("m")))
      agg.withColumn("ok",
        lit(numericFired && stringStoodDown && filterStoodDown))
    },

    // --- AS-OF with max staleness (q112): the enrichment contract real
    // --- pipelines run — a match older than the tolerance is WORSE than no
    // --- match (a price quote from last week must not price today's
    // --- trade). Same one-exchange union-window plan as q32; the bound is
    // --- applied to the carried extreme candidate, which is sound because
    // --- if the NEWEST prior right row is stale, all of them are. Oracle
    // --- restates it as the left-join argmax with a post-filter. ----------
    q("q112_asof_tolerance",
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM events WHERE event_type = 'view'),
        |cand AS (SELECT p.user_id, p.event_id AS purchase_lsn,
        |    u.event_id AS matched_lsn, u.value AS matched_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY u.event_id DESC) AS rn
        |  FROM p LEFT JOIN u
        |    ON p.user_id = u.user_id AND u.event_id <= p.event_id)
        |SELECT user_id, purchase_lsn,
        |  CASE WHEN purchase_lsn - matched_lsn <= 500 THEN matched_lsn END
        |    AS state_lsn,
        |  CASE WHEN purchase_lsn - matched_lsn <= 500 THEN matched_value END
        |    AS state_value
        |FROM cand WHERE rn = 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.asOf(purchases, views, Seq("user_id"),
          "event_id", "event_id",
          Map("event_id" -> "state_lsn", "value" -> "state_value"),
          fresh = Some((l, r) => l - r <= lit(500L)))
        .select(col("user_id"), col("event_id").as("purchase_lsn"),
          col("state_lsn"), col("state_value"))
    },

    // --- FORWARD as-of (q113): the "reaction" join — each purchase picks
    // --- the user's EARLIEST view at-or-after it (what did they look at
    // --- next). Same machinery as q32 scanning the reversed time order;
    // --- still one exchange, each row shipped once. Oracle = the argmin
    // --- restatement. -----------------------------------------------------
    q("q113_asof_forward",
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |u AS (SELECT * FROM events WHERE event_type = 'view'),
        |cand AS (SELECT p.user_id, p.event_id AS purchase_lsn,
        |    u.event_id AS next_lsn, u.value AS next_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY u.event_id ASC) AS rn
        |  FROM p LEFT JOIN u
        |    ON p.user_id = u.user_id AND u.event_id >= p.event_id)
        |SELECT user_id, purchase_lsn, next_lsn, next_value
        |FROM cand WHERE rn = 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("value"))
      graft.operators.AsOfJoin.asOf(purchases, views, Seq("user_id"),
          "event_id", "event_id",
          Map("event_id" -> "next_lsn", "value" -> "next_value"),
          forward = true)
        .select(col("user_id"), col("event_id").as("purchase_lsn"),
          col("next_lsn"), col("next_value"))
    },

    // --- global RANK + DENSE_RANK at scale (q117): the leaderboard shape
    // --- with heavy planted ties — part.p_size has ~50 distinct values
    // --- over the whole table, so every rank is a tie run and every
    // --- dense rank exercises the distinct-key base. Both ride
    // --- GlobalRank's two-level range-bucket decomposition (ties never
    // --- span buckets: the RangePartitioner is a function of the full
    // --- order key), never a single-partition window. Row-level output:
    // --- each of the N rows' (rank, dense_rank) must hash-match DuckDB's
    // --- window verbatim. ------------------------------------------------
    q("q117_global_rank_leaderboard",
      """SELECT p_partkey, p_size,
        |  RANK() OVER (ORDER BY p_size) AS rk,
        |  DENSE_RANK() OVER (ORDER BY p_size) AS dr
        |FROM part""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d).select(col("p_partkey"), col("p_size"))
      graft.operators.GlobalRank.rank(
          graft.operators.GlobalRank.denseRank(part, Seq(col("p_size")), "dr"),
          Seq(col("p_size")), "rk")
        .select(col("p_partkey"), col("p_size"), col("rk"), col("dr"))
    },

    // --- global NTILE at scale (q118): the quartile report — every order
    // --- tiled 1..4 by (o_totalprice, o_orderkey) through GlobalRank's
    // --- rank-arithmetic ntile (SQL tiling: the first `rows mod n` tiles
    // --- get the extra row), then the per-tile population and exact
    // --- revenue mass. Tile membership is fully load-bearing in the sums:
    // --- one row in the wrong tile moves two sum_price cells. -------------
    q("q118_ntile_quartiles",
      """WITH t AS (SELECT o_totalprice,
        |    NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
        |  FROM orders)
        |SELECT tile, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM t GROUP BY tile""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.GlobalRank.ntile(orders,
          Seq(col("o_totalprice"), col("o_orderkey")), 4, "tile")
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }
  )

  /** DuckDB twin of Layout.hilbert2: one (rx/ry, rotate, accumulate) CTE
    * pair per bit level, high to low — the q41 spread-ladder style extended
    * to the Hilbert walk. Starts from CTE `b(o_orderkey, x, y, d)`.
    */
  private def hilbertLadderSql(bits: Int): String =
    (bits - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == bits - 1) "b" else s"g${i + 1}"
      s"""r$i AS (SELECT o_orderkey,
         |  CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |  CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry, x, y, d FROM $prev),
         |g$i AS (SELECT o_orderkey,
         |  CASE WHEN ry = 0 AND rx = 1 THEN ${s - 1} - y
         |       WHEN ry = 0 THEN y ELSE x END AS x,
         |  CASE WHEN ry = 0 AND rx = 1 THEN ${s - 1} - x
         |       WHEN ry = 0 THEN x ELSE y END AS y,
         |  d + CAST(${s * s} AS BIGINT) * xor(3 * rx, ry) AS d FROM r$i)""".stripMargin
    }.mkString(",\n")
}
