package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.5 aggregations A1-A5, including the dynamic clause synthesis
  * the reference builds from `df.columns` at runtime
  * (`silver_table_creation.py:347-361`).
  *
  * Float determinism: 2-decimal money doubles aggregate through
  * `ROUND(x*100)` (integral cents — exact sums in any order, so Spark's
  * partial-aggregate order vs DuckDB's vectorized order cannot diverge),
  * then divide by 100.0 once.
  */
object AggQueries {
  import Q.QueryFn

  /** A1's dynamic synthesis, shared by the Spark and oracle sides: averages
    * every numeric non-key column as AVG(ROUND(c*100))/100.0.
    */
  private def a1AvgClauses(numericCols: Seq[String]): String =
    numericCols.map(c => s"AVG(ROUND($c * 100)) / 100.0 AS $c").mkString(", ")

  private val A1Keys = Seq("l_returnflag", "l_linestatus")

  val defs: Map[String, QueryFn] = Map(
    // A1 — dynamic multi-key GROUP BY + AVG synthesized from df.columns via
    // the temp-view SQL path (silver_table_creation.py:347-361).
    "a1_dynamic_groupby_sql" -> ((s, dir) => {
      val df = Tables.lineitem(s, dir)
      val numeric = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          !A1Keys.contains(f.name) => f.name
      }.toSeq
      df.createOrReplaceTempView("graft_a1_lineitem")
      s.sql(s"SELECT ${A1Keys.mkString(", ")}, ${a1AvgClauses(numeric)} " +
        s"FROM graft_a1_lineitem GROUP BY ${A1Keys.mkString(", ")}")
    }),

    // A2 — static GROUP BY with 14 aggregates (gold_table_creation.py:105-116)
    "a2_static_agg14" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).groupBy($"l_orderkey").agg(
        sum($"l_quantity").as("sum_qty"),
        avg($"l_quantity").as("avg_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        (sum(round($"l_extendedprice" * 100)) / 100.0).as("sum_price"),
        (avg(round($"l_extendedprice" * 100)) / 100.0).as("avg_price"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"),
        (sum(round($"l_discount" * 100)) / 100.0).as("sum_disc"),
        (avg(round($"l_tax" * 100)) / 100.0).as("avg_tax"),
        count(lit(1)).as("cnt"),
        countDistinct($"l_partkey").as("cnt_parts"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"))
    }),

    // A3 — GROUP BY + AVG, forecast-style 9 aggregates
    // (gold_table_creation.py:135-145)
    "a3_agg_orders" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).groupBy($"o_orderpriority", $"o_orderstatus").agg(
        count(lit(1)).as("cnt"),
        (avg(round($"o_totalprice" * 100)) / 100.0).as("avg_total"),
        (sum(round($"o_totalprice" * 100)) / 100.0).as("sum_total"),
        min($"o_totalprice").as("min_total"),
        max($"o_totalprice").as("max_total"),
        countDistinct($"o_custkey").as("cnt_cust"),
        min($"o_orderdate").as("min_date"),
        max($"o_orderdate").as("max_date"),
        avg($"o_custkey").as("avg_custkey"))
    }),

    // A4 — count() diagnostics (silver_table_creation.py:128-133 et al.)
    "a4_count" -> ((s, dir) => {
      Tables.lineitem(s, dir).agg(count(lit(1)).as("cnt"))
    }),

    // A5 — distinct().count() cardinality probe
    // (silver_table_creation.py:319-320)
    "a5_distinct_count" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"))
    }),

    // Approximate sketches (HLL++ distinct counts, quantile sketch) —
    // rows-only (approx values have no cross-engine oracle); accuracy
    // bounds proven against exact values in SketchSpec.
    "agg_approx_sketches" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).groupBy($"l_returnflag").agg(
        approx_count_distinct($"l_orderkey").as("approx_orders"),
        approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p50_price"),
        // scalar quartiles, not one array column — the driver's pandas-side
        // rows-only sort cannot order numpy arrays
        percentile_approx($"l_quantity", lit(0.25), lit(1000)).as("q25_qty"),
        percentile_approx($"l_quantity", lit(0.75), lit(1000)).as("q75_qty"))
    }),

    // DECISION-level cross-check for the sketches (the
    // dedup_decision_xcheck recipe): compare each approximate aggregate
    // against the IN-ENGINE exact value per group and emit whether it
    // lands inside a 3-sigma accuracy bound (default HLL rsd 0.05 → 15%;
    // rsd-0.01 HLL → 3%; approx-median rank-1/1000 → 2%, the SketchSpec
    // figure). 1-sigma bounds are too tight per group — the measured 'N'
    // group default-HLL error at sf0.01 is ~6%, well within 2 sigma. The
    // oracle cannot recompute HLL++, but it CAN predict the decision:
    // every bound-check must read true. Sketches are deterministic, so
    // the row set is stable, and a sketch regression (merge bug, wrong
    // precision mapping) flips a boolean into a hash mismatch.
    "agg_sketch_xcheck" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val approx = li.groupBy($"l_returnflag").agg(
        approx_count_distinct($"l_orderkey").as("a_orders"),
        approx_count_distinct($"l_partkey", 0.01).as("a_parts"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("a_p50"))
      // exact side: one SINGLE-distinct aggregation per key — each
      // rewrites to a two-phase hash agg (partial per (flag, key), then
      // count) with map-side combine; two distincts in ONE agg would
      // Expand every row 3× through a single hash aggregate instead.
      // The join glue is 3 rows per side.
      val eOrders = li.groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("e_orders"))
      val eParts = li.groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("e_parts"))
      val eP50 = li.groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("e_p50"))
      approx.join(eOrders, Seq("l_returnflag"))
        .join(eParts, Seq("l_returnflag"))
        .join(eP50, Seq("l_returnflag"))
        .selectExpr("l_returnflag",
          "ABS(a_orders - e_orders) / e_orders <= 0.15 AS orders_ok",
          "ABS(a_parts - e_parts) / e_parts <= 0.03 AS parts_ok",
          "ABS(a_p50 - e_p50) / e_p50 <= 0.02 AS p50_ok")
    }),

    // A6 — dynamic column profiler: per-column null/distinct/min/max stats
    // synthesized from df.columns at runtime (the data-quality "describe"
    // every pipeline runs before trusting a new table). One aggregation
    // row, unpivoted to one row per column.
    "a6_profile_dynamic" -> ((s, dir) => {
      val df = Tables.orders(s, dir)
      // one single-column aggregate per column, unioned — N cheap columnar
      // scans instead of one N-way multi-distinct Expand (N× the rows
      // through one hash aggregate)
      df.columns.toSeq.map { c =>
        df.agg(
          lit(c).as("col_name"),
          count(when(col(c).isNull, 1)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c).cast("string")).as("min_str"),
          max(col(c).cast("string")).as("max_str"))
      }.reduce(_ unionByName _)
    }),

    // Histogram via width_bucket: fixed-range bucketing of order totals.
    "agg_histogram" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .withColumn("bucket",
          expr("CAST(width_bucket(o_totalprice, 0, 600000, 12) AS INTEGER)"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          (sum(round($"o_totalprice" * 100)) / 100.0).as("bucket_total"))
    }),

    // Winsorization — the robust-statistics clip a quality-score pipeline
    // applies before averaging: per-group exact p05/p95 (a group-count-
    // sized aggregate, broadcast back) and every value clipped into the
    // band. The percentile table is 3 rows at any scale; the clip itself
    // is a narrow map over the fact side — no second shuffle.
    "agg_winsorize" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val pcts = o.groupBy($"o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
      o.join(broadcast(pcts), Seq("o_orderstatus"))
        .select($"o_orderkey", $"o_orderstatus",
          expr("LEAST(GREATEST(o_totalprice, p05), p95)").as("w_price"))
    }),

    // Distributed content fingerprint — the cross-engine audit for "did
    // the copy/migration/rewrite preserve every row": each row hashes its
    // canonical key fields (integers only — no float/timestamp formatting
    // divergence) into 64 buckets with a commutative integer checksum per
    // bucket, so the 64-row signature is order- and partitioning-
    // independent and two engines (or two clusters) can compare tables
    // without moving data. Map-side combine into a 64-group shuffle —
    // O(rows) scan, O(1) output at any scale.
    "agg_table_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .selectExpr("MD5(CONCAT_WS('|', CAST(o_orderkey AS STRING), " +
          "o_orderstatus, " +
          "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING))) AS h")
        .selectExpr(
          "(ASCII(SUBSTRING(h, 1, 1)) * 256 + ASCII(SUBSTRING(h, 2, 1))) % 64 AS bucket",
          "CAST(ASCII(SUBSTRING(h, 3, 1)) * 65536 + " +
            "ASCII(SUBSTRING(h, 4, 1)) * 256 + " +
            "ASCII(SUBSTRING(h, 5, 1)) AS BIGINT) AS w")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_rows"), sum($"w").as("checksum"))
    }),

    // Referential-integrity audit — the dbt-test / Deequ-style FK check a
    // warehouse runs after every load: per relationship, how many child
    // rows (and distinct keys) point at a nonexistent parent. Violations
    // are PLANTED deterministically (negated keys on %97 / %89 strata) so
    // the audit has real orphans to find and the oracle predicts them
    // exactly. Scale shape per FK: child keys reduce to per-key counts
    // FIRST (map-side combine — the join moves |distinct keys| rows, not
    // |child|), then one left join against the parent's distinct key set
    // (broadcast for dims) and a single aggregate. NOT EXISTS semantics,
    // so a null FK counts as an orphan only if the planted data makes one
    // (TPC-H keys are non-null).
    "audit_referential" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables.orders(s, dir).withColumn("o_custkey",
        when($"o_orderkey" % 97 === 0, -$"o_custkey").otherwise($"o_custkey"))
      val li = Tables.lineitem(s, dir).withColumn("l_suppkey",
        when($"l_orderkey" % 89 === 0, -$"l_suppkey").otherwise($"l_suppkey"))
      def fk(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame = {
        val cnt = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("n"))
        val marked = cnt.join(
          parent.select(col(pk).as("k")).distinct().withColumn("ok", lit(true)),
          Seq("k"), "left")
        marked.agg(
          lit(name).as("fk"),
          sum($"n").as("child_rows"),
          coalesce(sum(when($"ok".isNull, $"n")), lit(0L)).as("orphan_rows"),
          count(when($"ok".isNull, 1)).as("orphan_keys"))
      }
      Seq(
        fk("orders.o_custkey->customer.c_custkey",
          orders, "o_custkey", Tables.customer(s, dir), "c_custkey"),
        fk("lineitem.l_orderkey->orders.o_orderkey",
          li, "l_orderkey", orders, "o_orderkey"),
        fk("lineitem.l_partkey->part.p_partkey",
          li, "l_partkey", Tables.part(s, dir), "p_partkey"),
        fk("lineitem.l_suppkey->supplier.s_suppkey",
          li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
        fk("customer.c_nationkey->nation.n_nationkey",
          Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey"),
        fk("supplier.s_nationkey->nation.n_nationkey",
          Tables.supplier(s, dir), "s_nationkey", Tables.nation(s, dir), "n_nationkey"),
        fk("nation.n_regionkey->region.r_regionkey",
          Tables.nation(s, dir), "n_regionkey", Tables.region(s, dir), "r_regionkey")
      ).reduce(_ unionByName _)
    }),

    // ROLLUP / CUBE grouping sets (beyond the reference — completes the
    // aggregation surface a switching user expects).
    "agg_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    }),
    "agg_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), max($"o_totalprice").as("max_total"))
    }),

    // TPC-H Q1-shaped pricing summary — the classic hash-aggregate headline
    // (bench workhorse; all money paths via exact cents).
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity").as("sum_qty"),
        (sum(round($"l_extendedprice" * 100)) / 100.0).as("sum_base_price"),
        (sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 100)) / 100.0)
          .as("sum_disc_price"),
        avg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
    })
  )

  val oracles: Map[String, String] = Map(
    "agg_sketch_xcheck" ->
      ("SELECT l_returnflag, true AS orders_ok, true AS parts_ok, " +
       "true AS p50_ok FROM lineitem GROUP BY 1"),
    "a1_dynamic_groupby_sql" -> {
      // Same synthesis rule over lineitem's numeric columns (FIXTURES.md §A).
      val numeric = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      s"SELECT ${A1Keys.mkString(", ")}, ${a1AvgClauses(numeric)} " +
        s"FROM lineitem GROUP BY ${A1Keys.mkString(", ")}"
    },
    "a2_static_agg14" ->
      ("SELECT l_orderkey, SUM(l_quantity) AS sum_qty, AVG(l_quantity) AS avg_qty, " +
       "MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, " +
       "SUM(ROUND(l_extendedprice * 100)) / 100.0 AS sum_price, " +
       "AVG(ROUND(l_extendedprice * 100)) / 100.0 AS avg_price, " +
       "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, " +
       "SUM(ROUND(l_discount * 100)) / 100.0 AS sum_disc, " +
       "AVG(ROUND(l_tax * 100)) / 100.0 AS avg_tax, " +
       "CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS cnt_parts, " +
       "MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship " +
       "FROM lineitem GROUP BY l_orderkey"),
    "a3_agg_orders" ->
      ("SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "AVG(ROUND(o_totalprice * 100)) / 100.0 AS avg_total, " +
       "SUM(ROUND(o_totalprice * 100)) / 100.0 AS sum_total, " +
       "MIN(o_totalprice) AS min_total, MAX(o_totalprice) AS max_total, " +
       "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cnt_cust, " +
       "MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date, " +
       "AVG(o_custkey) AS avg_custkey " +
       "FROM orders GROUP BY o_orderpriority, o_orderstatus"),
    "a4_count" -> "SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem",
    "a5_distinct_count" ->
      ("SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders, " +
       "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts, " +
       "CAST(COUNT(DISTINCT (l_returnflag, l_linestatus)) AS BIGINT) AS n_flag_status " +
       "FROM lineitem"),
    "a6_profile_dynamic" -> {
      // same synthesis rule over the orders schema (FIXTURES.md §A)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"SELECT '$c' AS col_name, " +
          s"CAST(COUNT(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_null, " +
          s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"MIN(CAST($c AS VARCHAR)) AS min_str, " +
          s"MAX(CAST($c AS VARCHAR)) AS max_str FROM orders"
      }.mkString(" UNION ALL ")
    },
    "agg_histogram" ->
      ("SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0 " +
       "WHEN o_totalprice >= 600000 THEN 13 " +
       "ELSE CAST(FLOOR(o_totalprice / 50000) AS INTEGER) + 1 END AS INTEGER) AS bucket, " +
       "CAST(COUNT(*) AS BIGINT) AS n, " +
       "SUM(ROUND(o_totalprice * 100)) / 100.0 AS bucket_total " +
       "FROM orders GROUP BY 1"),
    "agg_winsorize" ->
      ("""WITH p AS (
         |  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.05) AS p05,
         |         quantile_cont(o_totalprice, 0.95) AS p95
         |  FROM orders GROUP BY 1)
         |SELECT o_orderkey, orders.o_orderstatus,
         |       LEAST(GREATEST(o_totalprice, p05), p95) AS w_price
         |FROM orders JOIN p ON orders.o_orderstatus = p.o_orderstatus""".stripMargin),
    "agg_table_fingerprint" ->
      ("""WITH h AS (
         |  SELECT MD5(CONCAT_WS('|', CAST(o_orderkey AS VARCHAR),
         |    o_orderstatus,
         |    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR))) AS h
         |  FROM orders)
         |SELECT CAST((ASCII(SUBSTR(h, 1, 1)) * 256 + ASCII(SUBSTR(h, 2, 1))) % 64
         |         AS INTEGER) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(SUM(ASCII(SUBSTR(h, 3, 1)) * 65536 +
         |                ASCII(SUBSTR(h, 4, 1)) * 256 +
         |                ASCII(SUBSTR(h, 5, 1))) AS BIGINT) AS checksum
         |FROM h GROUP BY 1""".stripMargin),
    "agg_rollup" ->
      ("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
       "CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
       "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "agg_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt, " +
       "MAX(o_totalprice) AS max_total FROM orders " +
       "GROUP BY CUBE (o_orderstatus, o_orderpriority)"),
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
       "SUM(ROUND(l_extendedprice * 100)) / 100.0 AS sum_base_price, " +
       "SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS sum_disc_price, " +
       "AVG(l_quantity) AS avg_qty, CAST(COUNT(*) AS BIGINT) AS count_order " +
       "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "audit_referential" -> {
      // one branch per FK; NOT EXISTS mirrors the anti-join orphan rule
      def fk(name: String, child: String, ck: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS fk,
           |  CAST(COUNT(*) AS BIGINT) AS child_rows,
           |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
           |    SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) AS BIGINT)
           |    AS orphan_rows,
           |  CAST(COUNT(DISTINCT $ck) FILTER (WHERE NOT EXISTS (
           |    SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) AS BIGINT)
           |    AS orphan_keys
           |FROM $child c""".stripMargin
      s"""WITH o AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey ELSE o_custkey END
         |      AS o_custkey
         |  FROM orders),
         |li AS (
         |  SELECT l_orderkey, l_partkey,
         |    CASE WHEN l_orderkey % 89 = 0 THEN -l_suppkey ELSE l_suppkey END
         |      AS l_suppkey
         |  FROM lineitem)
         |${fk("orders.o_custkey->customer.c_custkey", "o", "o_custkey", "customer", "c_custkey")}
         |UNION ALL
         |${fk("lineitem.l_orderkey->orders.o_orderkey", "li", "l_orderkey", "o", "o_orderkey")}
         |UNION ALL
         |${fk("lineitem.l_partkey->part.p_partkey", "li", "l_partkey", "part", "p_partkey")}
         |UNION ALL
         |${fk("lineitem.l_suppkey->supplier.s_suppkey", "li", "l_suppkey", "supplier", "s_suppkey")}
         |UNION ALL
         |${fk("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey")}
         |UNION ALL
         |${fk("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey")}
         |UNION ALL
         |${fk("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey")}""".stripMargin
    }
  )
}
