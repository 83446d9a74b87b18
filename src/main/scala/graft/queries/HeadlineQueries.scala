package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shaped headline queries (beyond the reference's own surface, for
  * bench depth) plus the join kinds the reference never uses — semi and
  * anti — completing the join coverage a switching user would expect.
  * Money paths follow the exact-cents rule (Q scaladoc).
  */
object HeadlineQueries {
  import Q.QueryFn

  val defs: Map[String, QueryFn] = Map(
    // Q3-shaped: shipping priority — filter dim, 2 joins, agg, top-k.
    "q3_shipping_priority" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg((sum(round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100)) / 100.0)
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // Q5-shaped: local-supplier revenue by nation within one region.
    "q5_local_supplier" -> ((s, dir) => {
      import s.implicits._
      val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .filter(c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg((sum(round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100)) / 100.0)
          .as("revenue"))
    }),

    // Q4-shaped: order-priority count with an EXISTS semi-join.
    "q4_order_priority" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1995-07-01")
      val late = Tables.lineitem(s, dir).filter($"l_discount" > 0.05)
      o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q6-shaped: single-scan filtered revenue aggregate (the pushdown
    // showcase — filters reach the parquet scan).
    "q6_forecast_revenue" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1996-01-01" &&
          $"l_discount" >= 0.02 && $"l_discount" <= 0.04 && $"l_quantity" < 25)
        .agg((sum(round($"l_extendedprice" * $"l_discount" * 100)) / 100.0)
          .as("revenue"))
    }),

    // Q10-shaped: revenue lost to returned items per customer, top 20.
    "q10_returned_items" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_mktsegment"))
        .agg((sum(round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100)) / 100.0)
          .as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // Q14-shaped: promo-type revenue share (conditional aggregation over a
    // broadcast part join) — exact-cents numerator and denominator.
    "q14_promo_share" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          (sum(when(p("p_type").startsWith("PROMO"),
            round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100))
            .otherwise(lit(0))) / 100.0).as("promo_revenue"),
          (sum(round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100)) / 100.0)
            .as("total_revenue"))
    }),

    // Q12-shaped: conditional priority counts per line status over a
    // date-bounded join (the CASE-inside-SUM pivot shape).
    "q12_priority_shipping" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1996-01-01")
      val o = Tables.orders(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(l("l_linestatus"))
        .agg(
          sum(when(o("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(o("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
    }),

    // Q18-shaped: large-volume orders — aggregate-then-join with a HAVING
    // gate, top 20 by value.
    "q18_large_orders" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("sum_qty"))
        .filter($"sum_qty" > 300)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(c("c_name"), c("c_custkey"), o("o_orderkey"), o("o_orderdate"),
          o("o_totalprice"), big("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    }),

    // Q19-shaped: disjunction of brand/size/quantity conjunctions over a
    // broadcast part join — the multi-clause OR predicate that exercises
    // CNF pushdown.
    "q19_disjunctive_pred" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (p("p_brand") === "Brand#11" && p("p_size").between(1, 15) &&
            l("l_quantity").between(1, 11)) ||
          (p("p_brand") === "Brand#22" && p("p_size").between(1, 25) &&
            l("l_quantity").between(10, 20)) ||
          (p("p_brand") === "Brand#33" && p("p_size").between(1, 35) &&
            l("l_quantity").between(20, 30)))
        .agg((sum(round(l("l_extendedprice") * (lit(1) - l("l_discount")) * 100)) / 100.0)
          .as("revenue"))
    }),

    // Bounded-heap top-k per group (typed Aggregator; shuffles k rows per
    // group instead of sorting whole partitions like window row_number).
    "topk_per_key" -> ((s, dir) =>
      graft.operators.TopK.perKey(Tables.lineitem(s, dir),
        Seq("l_returnflag", "l_linestatus"), "l_extendedprice",
        "l_orderkey", "l_linenumber", k = 3)),

    // Left-semi: orders having at least one heavy line.
    "j8_semi_join" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val heavy = Tables.lineitem(s, dir).filter($"l_quantity" > 45)
      o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    // Left-anti: orders with no lineitem at all.
    "j9_anti_join" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    })
  )

  private val Rev =
    "SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue"

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      (s"SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority, $Rev " +
       "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
       "JOIN customer c ON o.o_custkey = c.c_custkey " +
       "WHERE c.c_mktsegment = 'BUILDING' " +
       "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority " +
       "ORDER BY revenue DESC, l.l_orderkey LIMIT 10"),
    "q5_local_supplier" ->
      (s"SELECT n.n_name, $Rev " +
       "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
       "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
       "JOIN customer c ON o.o_custkey = c.c_custkey " +
       "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
       "JOIN region r ON n.n_regionkey = r.r_regionkey " +
       "WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey " +
       "GROUP BY n.n_name"),
    "q10_returned_items" ->
      (s"SELECT c.c_custkey, c.c_name, c.c_mktsegment, $Rev " +
       "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
       "JOIN customer c ON o.o_custkey = c.c_custkey " +
       "WHERE l.l_returnflag = 'R' " +
       "GROUP BY c.c_custkey, c.c_name, c.c_mktsegment " +
       "ORDER BY revenue DESC, c.c_custkey LIMIT 20"),
    "q14_promo_share" ->
      ("SELECT SUM(CASE WHEN p_type LIKE 'PROMO%' " +
       "THEN ROUND(l_extendedprice * (1 - l_discount) * 100) ELSE 0 END) / 100.0 " +
       "AS promo_revenue, " +
       "SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS total_revenue " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey"),
    "q4_order_priority" ->
      ("SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count " +
       "FROM orders o WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01' " +
       "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
       "AND l.l_discount > 0.05) GROUP BY o_orderpriority"),
    "q6_forecast_revenue" ->
      ("SELECT SUM(ROUND(l_extendedprice * l_discount * 100)) / 100.0 AS revenue " +
       "FROM lineitem WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01' " +
       "AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25"),
    "q12_priority_shipping" ->
      ("SELECT l_linestatus, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01' " +
       "GROUP BY l_linestatus"),
    "q18_large_orders" ->
      ("SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, g.sum_qty " +
       "FROM orders o " +
       "JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem " +
       "      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) g " +
       "  ON o.o_orderkey = g.l_orderkey " +
       "JOIN customer c ON o.o_custkey = c.c_custkey " +
       "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20"),
    "q19_disjunctive_pred" ->
      (s"SELECT $Rev FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) " +
       "   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) " +
       "   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"),
    "topk_per_key" ->
      ("SELECT l_returnflag, l_linestatus, l_orderkey, " +
       "CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
       "l_extendedprice, CAST(rn AS INTEGER) AS rank FROM (" +
       "SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice, " +
       "row_number() OVER (PARTITION BY l_returnflag, l_linestatus " +
       "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn " +
       "FROM lineitem) WHERE rn <= 3"),
    "j8_semi_join" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o " +
       "WHERE EXISTS (SELECT 1 FROM lineitem l " +
       "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)"),
    "j9_anti_join" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
       "WHERE NOT EXISTS (SELECT 1 FROM lineitem l " +
       "WHERE l.l_orderkey = o.o_orderkey)")
  )
}
