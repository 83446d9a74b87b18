package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** M0 flagship (SURVEY.md §7.5): the gold-style wide-table build —
  * a pre-aggregated lineitem rollup left-joined through
  * orders ⟕ customer ⟕ nation ⟕ region with a range filter, renames and
  * drops. Structurally isomorphic to `gold_table_creation.py:33-158`.
  *
  * Scale shape: one shuffle for the rollup (partial+final hash agg), one
  * shuffle join rollup⟕orders on the order key; customer/nation/region are
  * dims that Catalyst auto-broadcasts (verified via explain in BENCH notes).
  * Filters sit before joins so they push into the parquet scans.
  */
object Flagship {
  import Q.QueryFn

  def wideTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // A1-analog pre-aggregation before the join (gold_table_creation.py:100-119)
    val rollup = Tables.lineitem(s, dir).groupBy($"l_orderkey").agg(
      sum($"l_quantity").as("sum_qty"),
      (sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 100)) / 100.0)
        .as("revenue"),
      count(lit(1)).as("line_cnt"))

    val o = Tables.orders(s, dir)
      .filter($"o_totalprice" > 50000 && $"o_totalprice" < 400000) // F3 range
      .withColumnRenamed("o_orderpriority", "order_priority")      // P3 rename
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)

    o.join(rollup, o("o_orderkey") === rollup("l_orderkey"), "left")  // J4
      .join(c, o("o_custkey") === c("c_custkey"), "left")             // J3
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .drop("l_orderkey", "o_custkey", "c_custkey", "c_nationkey",    // P4 drops
        "n_nationkey", "n_regionkey", "r_regionkey", "c_acctbal", "o_orderdate")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"order_priority",
        $"c_name", $"c_mktsegment", $"n_name", $"r_name",
        $"sum_qty", $"revenue", $"line_cnt")
  }

  val defs: Map[String, QueryFn] = Map(
    "m0_wide_table" -> ((s, dir) => wideTable(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "m0_wide_table" ->
      ("""WITH rollup_li AS (
         |  SELECT l_orderkey, SUM(l_quantity) AS sum_qty,
         |         SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue,
         |         CAST(COUNT(*) AS BIGINT) AS line_cnt
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
         |       o.o_orderpriority AS order_priority,
         |       c.c_name, c.c_mktsegment, n.n_name, r.r_name,
         |       g.sum_qty, g.revenue, g.line_cnt
         |FROM orders o
         |LEFT JOIN rollup_li g ON o.o_orderkey = g.l_orderkey
         |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE o.o_totalprice > 50000 AND o.o_totalprice < 400000""".stripMargin)
  )
}
