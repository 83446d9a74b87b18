package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2 relational surface: scans (S1-S5), projections (P1-P4),
  * filters (F1-F5), joins (J1-J6), union (U1), sort/limit, window.
  * Each entry mirrors a reference use-site (file:line in comments) but runs
  * over the driver testdata tables.
  */
object Relational {
  import Q.QueryFn

  val defs: Map[String, QueryFn] = Map(
    // S3 — parquet table scan + projection (silver_table_creation.py:28 et al.)
    "s3_scan_projection" -> ((s, dir) => {
      Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // S4 — local relation from driver rows (silver_table_creation.py:282)
    "s4_local_relation" -> ((s, dir) => {
      import s.implicits._
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")).toDF("id", "tag")
    }),

    // S5 — temp-view registration bridging DataFrame → SQL
    // (silver_table_creation.py:353)
    "s5_temp_view_sql" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_s5_lineitem")
      s.sql("SELECT l_returnflag, COUNT(*) AS cnt FROM graft_s5_lineitem GROUP BY l_returnflag")
    }),

    // S1 — CSV scan with header + schema inference
    // (bronze_table_creation.py:25,30,...): parquet→csv→inferred read.
    "s1_csv_inferred_scan" -> ((s, dir) => {
      val p = Q.scratch(dir, "s1_csv")
      Tables.nation(s, dir).write.mode("overwrite").option("header", true).csv(p)
      s.read.option("header", true).option("inferSchema", true).csv(p)
        .select("n_nationkey", "n_name", "n_regionkey")
    }),

    // S2 — JSON scan with schema inference (bronze_table_creation.py:35)
    "s2_json_inferred_scan" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "s2_json")
      Tables.region(s, dir).write.mode("overwrite").json(p)
      s.read.json(p).select($"r_regionkey".cast("int").as("r_regionkey"), $"r_name")
    }),

    // P1 — selectExpr with computed ROUND alias (silver_table_creation.py:243)
    "p1_selectexpr_round" -> ((s, dir) => {
      Tables.lineitem(s, dir).selectExpr(
        "l_orderkey", "l_linenumber",
        "ROUND(l_extendedprice, 0) AS price_r",
        "ROUND(l_discount * 100, 0) AS disc_pct")
    }),

    // P2 — withColumn + expr: interval + CASE availability datetimes
    // (silver_table_creation.py:137,323-326)
    "p2_interval_case_datetime" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .withColumn("ship_ts",
          expr("l_shipdate + make_interval(0, 0, 0, 0, l_linenumber, 0, 0)"))
        .withColumn("available_ts",
          expr("CASE WHEN HOUR(ship_ts) < 4 THEN ship_ts + INTERVAL 1 DAY " +
               "ELSE ship_ts + INTERVAL 2 DAY END"))
        .select("l_orderkey", "l_linenumber", "ship_ts", "available_ts")
    }),

    // P3 — withColumnRenamed chain (gold_table_creation.py:36,65,88)
    "p3_rename_chain" -> ((s, dir) => {
      Tables.customer(s, dir)
        .withColumnRenamed("c_custkey", "custkey")
        .withColumnRenamed("c_name", "name")
        .select("custkey", "name", "c_acctbal")
    }),

    // P4 — drop varargs columns (gold_table_creation.py:152-158)
    "p4_drop_columns" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .drop("l_tax", "l_discount", "l_shipdate", "l_returnflag", "l_linestatus")
    }),

    // F1 — filter != literal (silver_table_creation.py:39)
    "f1_filter_neq" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).filter($"l_linenumber" =!= 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // F2 — IS NULL predicate (silver_table_creation.py:249); testdata has no
    // nulls, so NULLIF derives them first.
    "f2_filter_isnull" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .withColumn("pr", expr("NULLIF(o_orderstatus, 'O')"))
        .filter($"pr".isNull)
        .select("o_orderkey", "pr")
    }),

    // F3 — range-conjunction filter (gold_table_creation.py:126)
    "f3_filter_range" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_quantity" > 10 && $"l_quantity" < 20)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // F4 — dropna(how='any') (silver_table_creation.py:35 et al.)
    "f4_dropna_any" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_linenumber",
          "NULLIF(l_returnflag, 'A') AS rf", "NULLIF(l_linestatus, 'F') AS ls")
        .na.drop("any")
    }),

    // F5 — dropDuplicates over all columns (silver_table_creation.py:32)
    "f5_dropduplicates" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
    }),

    // F6 — single-shuffle co-partitioned dedup (DedupOps): exact DISTINCT
    // semantics proven against the same oracle as F5.
    "f6_dropduplicates_sorted" -> ((s, dir) =>
      graft.operators.DedupOps.dropDuplicatesSorted(
        Tables.lineitem(s, dir)
          .select("l_returnflag", "l_linestatus", "l_quantity"),
        coPartitionCol = "l_returnflag")),

    // J1 — left join on shared column list (silver_table_creation.py:314)
    "j1_join_shared_cols" -> ((s, dir) => {
      val c = Tables.customer(s, dir).withColumnRenamed("c_nationkey", "nationkey")
      val n = Tables.nation(s, dir).withColumnRenamed("n_nationkey", "nationkey")
      c.join(n, Seq("nationkey"), "left").select("c_custkey", "nationkey", "n_name")
    }),

    // J2 — left join, 4-col conjunctive equality on differently-named cols
    // (gold_table_creation.py:39)
    "j2_join_4col_conjunctive" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val grp = li.groupBy(
          $"l_orderkey".as("g_okey"), $"l_partkey".as("g_pkey"),
          $"l_suppkey".as("g_skey"), $"l_linenumber".as("g_lnum"))
        .agg(sum($"l_quantity").as("grp_qty"))
      li.join(grp,
          li("l_orderkey") === grp("g_okey") && li("l_partkey") === grp("g_pkey") &&
          li("l_suppkey") === grp("g_skey") && li("l_linenumber") === grp("g_lnum"),
          "left")
        .select(li("l_orderkey"), li("l_linenumber"), li("l_partkey"),
          li("l_suppkey"), $"grp_qty")
    }),

    // J3 — left join, single cross-named equality (gold_table_creation.py:68)
    "j3_join_crossnamed" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select($"o_orderkey", $"c_name", $"c_mktsegment")
    }),

    // J4 — left join on batch-style key (gold_table_creation.py:91)
    "j4_join_batchkey" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
        .select($"l_orderkey", $"l_linenumber", $"o_orderstatus")
    }),

    // J5 — left join, 3-col conjunctive (gold_table_creation.py:119)
    "j5_join_3col_conjunctive" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      val grp = li.groupBy(
          $"l_returnflag".as("g_rf"), $"l_linestatus".as("g_ls"),
          $"l_orderkey".as("g_okey"))
        .agg(count(lit(1)).as("grp_cnt"))
      li.join(grp,
          li("l_returnflag") === grp("g_rf") && li("l_linestatus") === grp("g_ls") &&
          li("l_orderkey") === grp("g_okey"), "left")
        .select(li("l_orderkey"), li("l_linenumber"), li("l_returnflag"),
          li("l_linestatus"), $"grp_cnt")
    }),

    // J6 — left join, 3-col conjunctive, forecast-style pre-agg
    // (gold_table_creation.py:148)
    "j6_join_3col_forecast" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val grp = o.groupBy(
          $"o_custkey".as("g_ck"), $"o_orderstatus".as("g_st"),
          $"o_orderpriority".as("g_pr"))
        .agg(count(lit(1)).as("grp_cnt"), max($"o_totalprice").as("grp_max_price"))
      o.join(grp,
          o("o_custkey") === grp("g_ck") && o("o_orderstatus") === grp("g_st") &&
          o("o_orderpriority") === grp("g_pr"), "left")
        .select($"o_orderkey", $"grp_cnt", $"grp_max_price")
    }),

    // U1 — union (silver_table_creation.py:287)
    "u1_union" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity")
      li.filter($"l_quantity" < 5).union(li.filter($"l_quantity" > 45))
    }),

    // Sort + limit (gold_table_creation.py:127); total order over output
    // columns so the top-k multiset is engine-independent.
    "sort_limit_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select("l_extendedprice", "l_orderkey", "l_linenumber", "l_partkey")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber", $"l_partkey")
        .limit(10)
    }),

    // Window — row_number (needed for the J7 argmin rewrite, SURVEY §2.6)
    "win_row_number" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"l_orderkey")
        .orderBy($"l_linenumber", $"l_partkey", $"l_suppkey")
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .select("l_orderkey", "l_linenumber", "rn")
    }),

    // Scalars — HOUR + CASE WHEN (silver_table_creation.py:325)
    "sc_hour_case" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .selectExpr("l_orderkey", "l_linenumber",
          "HOUR(l_shipdate + make_interval(0, 0, 0, 0, l_linenumber, 0, 0)) AS h",
          "CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS band")
    })
  )

  val oracles: Map[String, String] = Map(
    "s3_scan_projection" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "s4_local_relation" ->
      "SELECT * FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) AS t(id, tag)",
    "s5_temp_view_sql" ->
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag",
    "s1_csv_inferred_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "s2_json_inferred_scan" ->
      "SELECT r_regionkey, r_name FROM region",
    "p1_selectexpr_round" ->
      ("SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 0) AS price_r, " +
       "ROUND(l_discount * 100, 0) AS disc_pct FROM lineitem"),
    "p2_interval_case_datetime" ->
      ("""SELECT l_orderkey, l_linenumber, ship_ts, """ +
       """CASE WHEN HOUR(ship_ts) < 4 THEN ship_ts + INTERVAL 1 DAY """ +
       """ELSE ship_ts + INTERVAL 2 DAY END AS available_ts """ +
       """FROM (SELECT l_orderkey, l_linenumber, """ +
       """l_shipdate + INTERVAL (l_linenumber) HOUR AS ship_ts FROM lineitem)"""),
    "p3_rename_chain" ->
      "SELECT c_custkey AS custkey, c_name AS name, c_acctbal FROM customer",
    "p4_drop_columns" ->
      ("SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, " +
       "l_extendedprice FROM lineitem"),
    "f1_filter_neq" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
       "WHERE l_linenumber <> 1"),
    "f2_filter_isnull" ->
      ("SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS pr FROM orders " +
       "WHERE NULLIF(o_orderstatus, 'O') IS NULL"),
    "f3_filter_range" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
       "WHERE l_quantity > 10 AND l_quantity < 20"),
    "f4_dropna_any" ->
      ("SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag, 'A') AS rf, " +
       "NULLIF(l_linestatus, 'F') AS ls FROM lineitem " +
       "WHERE NULLIF(l_returnflag, 'A') IS NOT NULL " +
       "AND NULLIF(l_linestatus, 'F') IS NOT NULL"),
    "f5_dropduplicates" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
    "f6_dropduplicates_sorted" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
    "j1_join_shared_cols" ->
      ("SELECT c.c_custkey, c.c_nationkey AS nationkey, n.n_name " +
       "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey"),
    "j2_join_4col_conjunctive" ->
      ("WITH g AS (SELECT l_orderkey AS g_okey, l_partkey AS g_pkey, " +
       "l_suppkey AS g_skey, l_linenumber AS g_lnum, SUM(l_quantity) AS grp_qty " +
       "FROM lineitem GROUP BY 1, 2, 3, 4) " +
       "SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, g.grp_qty " +
       "FROM lineitem l LEFT JOIN g ON l.l_orderkey = g.g_okey " +
       "AND l.l_partkey = g.g_pkey AND l.l_suppkey = g.g_skey " +
       "AND l.l_linenumber = g.g_lnum"),
    "j3_join_crossnamed" ->
      ("SELECT o.o_orderkey, c.c_name, c.c_mktsegment FROM orders o " +
       "LEFT JOIN customer c ON o.o_custkey = c.c_custkey"),
    "j4_join_batchkey" ->
      ("SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus FROM lineitem l " +
       "LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey"),
    "j5_join_3col_conjunctive" ->
      ("WITH g AS (SELECT l_returnflag AS g_rf, l_linestatus AS g_ls, " +
       "l_orderkey AS g_okey, COUNT(*) AS grp_cnt FROM lineitem GROUP BY 1, 2, 3) " +
       "SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus, " +
       "g.grp_cnt FROM lineitem l LEFT JOIN g ON l.l_returnflag = g.g_rf " +
       "AND l.l_linestatus = g.g_ls AND l.l_orderkey = g.g_okey"),
    "j6_join_3col_forecast" ->
      ("WITH g AS (SELECT o_custkey AS g_ck, o_orderstatus AS g_st, " +
       "o_orderpriority AS g_pr, COUNT(*) AS grp_cnt, " +
       "MAX(o_totalprice) AS grp_max_price FROM orders GROUP BY 1, 2, 3) " +
       "SELECT o.o_orderkey, g.grp_cnt, g.grp_max_price FROM orders o " +
       "LEFT JOIN g ON o.o_custkey = g.g_ck AND o.o_orderstatus = g.g_st " +
       "AND o.o_orderpriority = g.g_pr"),
    "u1_union" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5 " +
       "UNION ALL " +
       "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45"),
    "sort_limit_topk" ->
      ("SELECT l_extendedprice, l_orderkey, l_linenumber, l_partkey FROM lineitem " +
       "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey LIMIT 10"),
    "win_row_number" ->
      ("SELECT l_orderkey, l_linenumber, " +
       "row_number() OVER (PARTITION BY l_orderkey " +
       "ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem"),
    "sc_hour_case" ->
      ("SELECT l_orderkey, l_linenumber, " +
       "CAST(HOUR(l_shipdate + INTERVAL (l_linenumber) HOUR) AS INTEGER) AS h, " +
       "CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS band FROM lineitem")
  )
}
