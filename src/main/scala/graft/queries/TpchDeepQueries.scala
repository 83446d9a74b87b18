package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining TPC-H query shapes the catalog did not yet exercise —
  * adapted to the testdata surface (no partsupp table, no commit/receipt
  * dates): the part↔supplier bridge is `SELECT DISTINCT l_partkey,
  * l_suppkey FROM lineitem`, and "late" is shipdate > orderdate + 60 days.
  *
  * Shapes covered here and why they matter at 100 TB:
  *   - q2: per-group argmin resolved by aggregate-then-equi-join (never a
  *     correlated per-row subquery at execution time);
  *   - q7/q8/q9: 5-7-way star joins where every dimension side broadcasts
  *     and only the fact tables shuffle;
  *   - q11/q15/q17/q22: scalar/correlated subqueries left to Catalyst's
  *     decorrelation (RewriteCorrelatedScalarSubquery turns them into the
  *     same aggregate+join plans we'd hand-write);
  *   - q13: left-outer join preserving empty groups + two-level aggregate;
  *   - q16: distinct bridge + NOT IN (null-free rewrite to left-anti);
  *   - q21: double EXISTS/NOT-EXISTS correlation rewritten as ONE
  *     per-order aggregate join — the self-join-free form (two semi/anti
  *     self-joins of the fact table would shuffle lineitem three times;
  *     the aggregate form shuffles it once for the stats and once for the
  *     probe, and the stats side is orders-sized, not lines-sized).
  *
  * Money aggregates follow the exact-cents rule, LIMITs order by a total
  * order (Q scaladoc).
  */
object TpchDeepQueries {
  import Q.QueryFn

  private val RevCents = "ROUND(l_extendedprice * (1 - l_discount) * 100)"

  val defs: Map[String, QueryFn] = Map(
    // Q2-shaped: min-acctbal supplier per part in one region. The
    // correlated MIN becomes groupBy + join-back-on-equality; ties keep
    // every minimal supplier (same multiset as the correlated form).
    "q2_min_acctbal_supplier" -> ((s, dir) => {
      import s.implicits._
      val bridge = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey").distinct()
      val p = Tables.part(s, dir).filter($"p_size" === 15 && $"p_type" === "STANDARD")
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter($"r_name" === "EUROPE")
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      val cand = bridge
        .join(broadcast(p), $"l_partkey" === $"p_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .select($"p_partkey", $"p_name", $"s_acctbal", $"s_name", $"n_name")
      val minBal = cand.groupBy($"p_partkey".as("mk"))
        .agg(min($"s_acctbal").as("min_bal"))
      cand.join(minBal, $"p_partkey" === $"mk" && $"s_acctbal" === $"min_bal")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name")
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
        .limit(100)
    }),

    // Q7-shaped: bidirectional nation-pair shipping volume by year.
    "q7_volume_shipping" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1997-01-01")
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val n1 = Tables.nation(s, dir)
        .select($"n_nationkey".as("supp_nk"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select($"n_nationkey".as("cust_nk"), $"n_name".as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === $"supp_nk")
        .join(broadcast(n2), c("c_nationkey") === $"cust_nk")
        .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
                ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
        .groupBy($"supp_nation", $"cust_nation", year(l("l_shipdate")).as("l_year"))
        .agg((sum(expr(RevCents)) / 100.0).as("revenue"))
    }),

    // Q8-shaped: one supplier nation's market share inside one customer
    // region per year — numerator and denominator are both exact-cents
    // sums, divided once.
    "q8_market_share" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val p = Tables.part(s, dir).filter($"p_type" === "ECONOMY")
      val n1 = Tables.nation(s, dir)
        .select($"n_nationkey".as("supp_nk"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir).select($"n_nationkey".as("cust_nk"), $"n_regionkey")
      val r = Tables.region(s, dir).filter($"r_name" === "AMERICA")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === $"supp_nk")
        .join(broadcast(n2), c("c_nationkey") === $"cust_nk")
        .join(broadcast(r), $"n_regionkey" === r("r_regionkey"))
        .groupBy(year(o("o_orderdate")).as("o_year"))
        .agg((sum(when($"supp_nation" === "NATION_2", expr(RevCents)).otherwise(lit(0)))
          / sum(expr(RevCents))).as("mkt_share"))
    }),

    // Q9-shaped: profit by supplier nation and year over a part-name
    // substring filter; cost side adapted to 0.5 * retailprice * quantity
    // (no partsupp.supplycost in the testdata).
    "q9_profit_by_nation" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).filter($"p_name".contains("bolt"))
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(n("n_name").as("nation"), year(o("o_orderdate")).as("o_year"))
        .agg((sum(round((l("l_extendedprice") * (lit(1) - l("l_discount"))
          - lit(0.5) * p("p_retailprice") * l("l_quantity")) * 100)) / 100.0)
          .as("sum_profit"))
    }),

    // Q11-shaped: per-part value concentration with a scalar-subquery
    // HAVING threshold (Catalyst decorrelates to aggregate + broadcast).
    "q11_important_parts" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_tpch_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("graft_tpch_supplier")
      s.sql(
        """WITH v AS (
          |  SELECT l_partkey, SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS value_cents
          |  FROM graft_tpch_lineitem JOIN graft_tpch_supplier ON l_suppkey = s_suppkey
          |  WHERE s_nationkey = 7 GROUP BY l_partkey)
          |SELECT l_partkey, value_cents/100.0 AS part_value FROM v
          |WHERE value_cents > (SELECT SUM(value_cents)*0.001 FROM v)""".stripMargin)
    }),

    // Q13-shaped: order-count-per-customer distribution; the join filter
    // lives in the ON clause so order-less customers survive with count 0.
    "q13_custdist" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter($"o_orderpriority" =!= "3-MEDIUM")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q15-shaped: top supplier by quarterly revenue via a shared CTE and a
    // scalar MAX subquery over it.
    "q15_top_supplier" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_tpch_lineitem15")
      Tables.supplier(s, dir).createOrReplaceTempView("graft_tpch_supplier15")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |         SUM(ROUND(l_extendedprice*(1-l_discount)*100))/100.0 AS total_revenue
          |  FROM graft_tpch_lineitem15
          |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_revenue
          |FROM graft_tpch_supplier15 JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin)
    }),

    // Q16-shaped: supplier diversity per (brand, type, size) through the
    // distinct bridge, excluding negative-balance suppliers (NOT IN over a
    // null-free key set ≡ left-anti).
    "q16_supplier_cnt" -> ((s, dir) => {
      import s.implicits._
      val bridge = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey").distinct()
      val badSup = Tables.supplier(s, dir).filter($"s_acctbal" < 0)
      val p = Tables.part(s, dir)
        .filter($"p_brand" =!= "Brand#13" && $"p_type" =!= "PROMO")
      bridge
        .join(broadcast(badSup), $"l_suppkey" === badSup("s_suppkey"), "left_anti")
        .join(broadcast(p), $"l_partkey" === p("p_partkey"))
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    }),

    // Q17-shaped: revenue from small-quantity lines, where "small" is a
    // per-part correlated average. The threshold compare is division-free
    // (qty*5*cnt < sum_qty) so both engines decide identically on exact
    // doubles.
    "q17_small_qty_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_tpch_lineitem17")
      Tables.part(s, dir).createOrReplaceTempView("graft_tpch_part17")
      s.sql(
        """WITH agg AS (
          |  SELECT l_partkey AS a_pk, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
          |  FROM graft_tpch_lineitem17 GROUP BY l_partkey)
          |SELECT SUM(ROUND(l_extendedprice*100))/100.0/7.0 AS avg_yearly
          |FROM graft_tpch_lineitem17 l
          |JOIN graft_tpch_part17 p ON l.l_partkey = p.p_partkey
          |JOIN agg ON a_pk = l.l_partkey
          |WHERE p_brand = 'Brand#23' AND l_quantity*5*cnt < sum_qty""".stripMargin)
    }),

    // Q21-shaped: suppliers whose line was the ONLY late one in a
    // multi-supplier finished order. The EXISTS/NOT-EXISTS pair collapses
    // into one per-order aggregate: distinct suppliers ≥ 2 AND distinct
    // LATE suppliers = 1 (l1 itself is late, so it is the one).
    "q21_waiting_suppliers" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
      val l = Tables.lineitem(s, dir)
      val lo = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("is_late",
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"))
      val stats = lo.groupBy(l("l_orderkey").as("stat_ok"))
        .agg(countDistinct(l("l_suppkey")).as("nsupp"),
          countDistinct(when($"is_late", l("l_suppkey"))).as("nlate"))
      val sup3 = Tables.supplier(s, dir).filter($"s_nationkey" === 3)
      lo.filter($"is_late")
        .join(broadcast(sup3), l("l_suppkey") === sup3("s_suppkey"))
        .join(stats, l("l_orderkey") === $"stat_ok")
        .filter($"nsupp" >= 2 && $"nlate" === 1)
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(20)
    }),

    // Q20-shaped: suppliers concentrated on a recent year — their 1995
    // shipped quantity of a flagged part exceeds half their all-time
    // quantity for it (the "excess stock" predicate adapted to the
    // testdata: no partsupp.availqty, so the threshold is the supplier's
    // own history). The correlated IN collapses to aggregate → broadcast
    // part filter → left-semi join; the comparison is division-free
    // (qty95*2 > qty_all) so both engines decide on exact doubles.
    "q20_excess_stock_suppliers" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val q = l.groupBy($"l_partkey", $"l_suppkey")
        .agg(sum(when(year($"l_shipdate") === 1995, $"l_quantity")
          .otherwise(lit(0.0))).as("qty95"),
          sum($"l_quantity").as("qty_all"))
      val p = Tables.part(s, dir)
        .filter($"p_name".contains("bolt")).select($"p_partkey")
      val cand = q.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .filter($"qty95" * 2 > $"qty_all")
        .select($"l_suppkey").distinct()
      Tables.supplier(s, dir).filter($"s_nationkey".isin(3, 5, 7))
        .join(cand, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_suppkey")
    }),

    // Q22-shaped: lapsed high-balance customers per segment — scalar AVG
    // subquery threshold (exact cents, division sequence identical in both
    // engines) plus NOT EXISTS recent orders.
    "q22_lapsed_customers" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_tpch_customer22")
      Tables.orders(s, dir).createOrReplaceTempView("graft_tpch_orders22")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS numcust,
          |       SUM(ROUND(c_acctbal*100))/100.0 AS totacctbal
          |FROM graft_tpch_customer22 c
          |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
          |AND c_acctbal > (SELECT SUM(ROUND(c_acctbal*100))/COUNT(*)/100.0
          |                 FROM graft_tpch_customer22
          |                 WHERE c_acctbal > 0.0
          |                 AND c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
          |AND NOT EXISTS (SELECT 1 FROM graft_tpch_orders22 o
          |                WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderdate >= '2000-01-01')
          |GROUP BY c_mktsegment""".stripMargin)
    })
  )

  private val Rev =
    "SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue"

  val oracles: Map[String, String] = Map(
    "q2_min_acctbal_supplier" ->
      ("""WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |cand AS (SELECT p.p_partkey, p.p_name, s.s_acctbal, s.s_name, n.n_name
         |  FROM bridge b JOIN part p ON b.l_partkey = p.p_partkey
         |  JOIN supplier s ON b.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE')
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM cand c
         |WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
         |                   WHERE c2.p_partkey = c.p_partkey)
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),
    "q7_volume_shipping" ->
      (s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |CAST(year(l.l_shipdate) AS INTEGER) AS l_year, $Rev
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE l.l_shipdate >= '1995-01-01' AND l.l_shipdate < '1997-01-01'
         |AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3""".stripMargin),
    "q8_market_share" ->
      ("""SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |SUM(CASE WHEN n1.n_name = 'NATION_2'
         |    THEN ROUND(l.l_extendedprice*(1-l.l_discount)*100) ELSE 0 END)
         | / SUM(ROUND(l.l_extendedprice*(1-l.l_discount)*100)) AS mkt_share
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |JOIN region r ON n2.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
         |GROUP BY 1""".stripMargin),
    "q9_profit_by_nation" ->
      ("""SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |SUM(ROUND((l.l_extendedprice*(1-l.l_discount)
         |           - 0.5*p.p_retailprice*l.l_quantity)*100))/100.0 AS sum_profit
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE p.p_name LIKE '%bolt%'
         |GROUP BY 1, 2""".stripMargin),
    "q11_important_parts" ->
      ("""WITH v AS (
         |  SELECT l_partkey, SUM(ROUND(l_extendedprice*(1-l_discount)*100)) AS value_cents
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  WHERE s_nationkey = 7 GROUP BY l_partkey)
         |SELECT l_partkey, value_cents/100.0 AS part_value FROM v
         |WHERE value_cents > (SELECT SUM(value_cents)*0.001 FROM v)""".stripMargin),
    "q13_custdist" ->
      ("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
         |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
         |  FROM customer c LEFT JOIN orders o
         |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '3-MEDIUM'
         |  GROUP BY c.c_custkey)
         |GROUP BY c_count""".stripMargin),
    "q15_top_supplier" ->
      ("""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         SUM(ROUND(l_extendedprice*(1-l_discount)*100))/100.0 AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin),
    "q16_supplier_cnt" ->
      ("""SELECT p_brand, p_type, p_size,
         |CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
         |JOIN part ON p_partkey = l_partkey
         |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
         |AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3""".stripMargin),
    "q17_small_qty_revenue" ->
      ("""WITH agg AS (
         |  SELECT l_partkey AS a_pk, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT SUM(ROUND(l_extendedprice*100))/100.0/7.0 AS avg_yearly
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN agg ON a_pk = l.l_partkey
         |WHERE p_brand = 'Brand#23' AND l_quantity*5*cnt < sum_qty""".stripMargin),
    "q20_excess_stock_suppliers" ->
      ("""WITH q AS (
         |  SELECT l_partkey, l_suppkey,
         |         SUM(CASE WHEN year(l_shipdate)=1995 THEN l_quantity ELSE 0 END) AS qty95,
         |         SUM(l_quantity) AS qty_all
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT s_suppkey, s_name FROM supplier
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey FROM q JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE '%bolt%' AND qty95 * 2 > qty_all)
         |AND s_nationkey IN (3, 5, 7)
         |ORDER BY s_suppkey""".stripMargin),
    "q21_waiting_suppliers" ->
      ("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         |FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
         |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         |WHERE o.o_orderstatus = 'F' AND s.s_nationkey = 3
         |AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
         |AND EXISTS (SELECT 1 FROM lineitem l2
         |            WHERE l2.l_orderkey = l1.l_orderkey
         |            AND l2.l_suppkey <> l1.l_suppkey)
         |AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |                WHERE l3.l_orderkey = l1.l_orderkey
         |                AND l3.l_suppkey <> l1.l_suppkey
         |                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin),
    "q22_lapsed_customers" ->
      ("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
         |       SUM(ROUND(c_acctbal*100))/100.0 AS totacctbal
         |FROM customer c
         |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
         |AND c_acctbal > (SELECT SUM(ROUND(c_acctbal*100))/COUNT(*)/100.0
         |                 FROM customer
         |                 WHERE c_acctbal > 0.0
         |                 AND c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
         |AND NOT EXISTS (SELECT 1 FROM orders o
         |                WHERE o.o_custkey = c.c_custkey
         |                AND o.o_orderdate >= '2000-01-01')
         |GROUP BY c_mktsegment""".stripMargin)
  )
}
