package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function breadth (lag/lead, rank/dense_rank/ntile, running
  * aggregates), set operations (intersect/except), pivot, grouping sets,
  * exact percentiles, regex/string surface and the null-safe join —
  * completing §2.6's category beyond the single row_number the reference's
  * rewrite needs. Determinism: every window orders by a total order over
  * the partition (unique key tiebreak) except rank/dense_rank, whose
  * outputs are tie-invariant by definition.
  */
object WindowSetQueries {
  import Q.QueryFn

  val defs: Map[String, QueryFn] = Map(
    // lag/lead of the previous/next order per customer (unique (date, key)
    // order inside each customer partition).
    "win_lag_lead" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_total"),
        lead($"o_totalprice", 1).over(w).as("next_total"),
        (unix_date($"o_orderdate".cast("date")) -
          unix_date(lag($"o_orderdate", 1).over(w).cast("date"))).as("days_since_prev"))
    }),

    // rank/dense_rank tolerate ties (tie-invariant); ntile gets a unique
    // order so bucket boundaries are engine-independent.
    "win_rank_dense" -> ((s, dir) => {
      import s.implicits._
      val byQty = Window.partitionBy($"l_returnflag", $"l_linestatus")
        .orderBy($"l_quantity")
      val unique = Window.partitionBy($"l_returnflag", $"l_linestatus")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      Tables.lineitem(s, dir).select(
        $"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus",
        rank().over(byQty).as("qty_rank"),
        dense_rank().over(byQty).as("qty_dense"),
        ntile(4).over(unique).as("price_quartile"))
    }),

    // Relative-position windows: percent_rank / cume_dist over a unique
    // total order (tie-free → engine-independent).
    "win_percent_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_orderstatus",
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // ntile quantile bucketing — the windowed form of quota sampling:
    // each customer's orders split into 4 price quartiles. The order key
    // (o_totalprice, o_orderkey) is a total order, so bucket boundaries
    // are engine-independent (ntile with ties under a partial order is
    // not). Per-customer partitions: the window parallelizes across the
    // key space at any scale.
    "win_ntile" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey", $"o_totalprice",
        ntile(4).over(w).as("price_quartile"))
    }),

    // nth_value over the whole partition (explicit full frame — the
    // default frame stops at CURRENT ROW, which both engines honor but
    // which is rarely what "the customer's 2nd order" means).
    "win_nth_value" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey",
        nth_value($"o_totalprice", 2).over(w).as("second_total"))
    }),

    // Running (cumulative) sum and count per customer in date order.
    "win_running_sum" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey", $"o_orderdate",
        (sum(round($"o_totalprice" * 100)).over(w) / 100.0).as("run_total"),
        count(lit(1)).over(w).as("run_cnt"))
    }),

    // RANGE frame: peers by VALUE distance, not row position — sums over
    // all orders within ±500 of each order's total, per status.
    "win_range_frame" -> ((s, dir) => {
      // SQL path: typed RANGE offsets over a double ordering column
      Tables.orders(s, dir).createOrReplaceTempView("graft_wrf_orders")
      s.sql(
        """SELECT o_orderkey, o_orderstatus, o_totalprice,
          |  COUNT(*) OVER w AS n_near,
          |  SUM(ROUND(o_totalprice * 100)) OVER w / 100.0 AS near_total
          |FROM graft_wrf_orders
          |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
          |             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)""".stripMargin)
    }),

    // Digest functions (engine-exact hex output).
    "sc_hash_funcs" -> ((s, dir) => {
      Tables.customer(s, dir).selectExpr(
        "c_custkey",
        "MD5(c_name) AS h_md5",
        "SHA2(c_name, 256) AS h_sha256")
    }),

    // bool_and/bool_or and min_by/max_by aggregates.
    "agg_bool_minmax_by" -> ((s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).groupBy($"o_orderstatus").agg(
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 500000)").as("any_over_500k"),
        // min_by/max_by keyed on the UNIQUE order key (ties on price would
        // make the picked row engine-dependent)
        expr("min_by(o_totalprice, o_orderkey)").as("first_order_price"),
        expr("max_by(o_totalprice, o_orderkey)").as("last_order_price"))
    }),

    // Frame-edge windows: first/last/nth value over an explicit frame.
    "win_first_last" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir).select(
        $"o_orderkey", $"o_custkey",
        first($"o_totalprice").over(w).as("first_total"),
        last($"o_totalprice").over(w).as("last_total"),
        nth_value($"o_totalprice", 2).over(w).as("second_total"))
    }),

    // Bitwise scalar surface.
    "sc_bitwise_funcs" -> ((s, dir) => {
      Tables.orders(s, dir).selectExpr(
        "o_orderkey",
        "o_orderkey & 255 AS low_byte",
        "o_orderkey | 1 AS odd_or",
        "CAST(o_orderkey ^ o_custkey AS BIGINT) AS keys_xor",
        "SHIFTLEFT(o_orderkey, 2) AS shl2",
        "SHIFTRIGHT(o_orderkey, 3) AS shr3",
        "CAST(BIT_COUNT(o_orderkey) AS INTEGER) AS popcount")
    }),

    // INTERSECT: customers having both an open and a finished order.
    "set_intersect" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.filter($"o_orderstatus" === "O").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
    }),

    // EXCEPT: customers with an open order but no finished one.
    "set_except" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.filter($"o_orderstatus" === "O").select($"o_custkey")
        .except(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
    }),

    // EXCEPT ALL — multiset difference (duplicates preserved).
    "set_except_all" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      o.filter($"o_totalprice" > 100000).select($"o_custkey")
        .exceptAll(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
    }),

    // unionByName with missing columns null-filled (schema-evolution union).
    "u2_union_by_name" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.orders(s, dir).filter($"o_orderkey" % 4 === 0)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val b = Tables.orders(s, dir).filter($"o_orderkey" % 4 === 1)
        .select($"o_orderstatus", $"o_orderkey") // reordered, missing price
      a.unionByName(b, allowMissingColumns = true)
    }),

    // Ordered string aggregation (listagg): deterministic via sorted join.
    "agg_string_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir).filter($"c_custkey" <= 200)
        .groupBy($"c_mktsegment")
        // sort the STRING forms — the oracle's string_agg orders
        // lexicographically, not numerically
        .agg(array_join(array_sort(collect_list($"c_custkey".cast("string"))), ",")
          .as("custkeys"),
          count(lit(1)).as("n"))
    }),

    // Pivot: line status columns per return flag (explicit value list — at
    // scale an implicit pivot pays a distinct-values job first).
    "agg_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum($"l_quantity"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    }),

    // GROUPING SETS with grouping_id — the general form behind
    // rollup/cube, via the SQL path.
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_gs_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          |       COUNT(*) AS cnt, SUM(ROUND(o_totalprice * 100)) / 100.0 AS total
          |FROM graft_gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // Exact percentiles (interpolating, Hive/SQL-standard formula) — the
    // exact twin of the approx sketches query.
    "agg_percentile_exact" -> ((s, dir) => {
      Tables.lineitem(s, dir).groupBy(col("l_returnflag")).agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.25)").as("q25_qty"),
        expr("percentile(round(l_extendedprice * 100), 0.9)").as("p90_cents"))
    }),

    // Regex/string surface: extract, replace-all, split, position.
    "sc_regex_funcs" -> ((s, dir) => {
      Tables.customer(s, dir).selectExpr(
        "c_custkey",
        "regexp_extract(c_name, '([0-9]+)$', 1) AS name_num",
        "regexp_replace(c_mktsegment, '[AEIOU]', '_') AS seg_masked",
        "CAST(size(split(c_name, '#')) AS BIGINT) AS name_parts",
        "CAST(instr(c_name, '#') AS BIGINT) AS hash_pos",
        "CAST(startswith(c_mktsegment, 'BUIL') AS BOOLEAN) AS is_building",
        "CAST(endswith(c_name, '1') AS BOOLEAN) AS ends_one")
    }),

    // Scalar subquery: orders above the global average price.
    "sub_scalar_avg" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_sub_orders")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM graft_sub_orders
          |WHERE o_totalprice > (SELECT SUM(ROUND(o_totalprice * 100)) / 100.0
          |                           / COUNT(*) FROM graft_sub_orders)""".stripMargin)
    }),

    // IN subquery over a filtered key set.
    "sub_in_keys" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_sub_orders2")
      Tables.customer(s, dir).createOrReplaceTempView("graft_sub_cust")
      s.sql(
        """SELECT o_orderkey, o_custkey FROM graft_sub_orders2
          |WHERE o_custkey IN (SELECT c_custkey FROM graft_sub_cust
          |                    WHERE c_mktsegment = 'MACHINERY')""".stripMargin)
    }),

    // UNPIVOT (melt): wide aggregate row → long (measure, value) rows.
    "agg_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).groupBy($"l_returnflag")
        .agg((sum(round($"l_extendedprice" * 100)) / 100.0).as("price_total"),
          sum($"l_quantity").as("qty_total"),
          (sum(round($"l_tax" * 100)) / 100.0).as("tax_total"))
        .unpivot(Array($"l_returnflag"),
          Array($"price_total", $"qty_total", $"tax_total"),
          "measure", "value")
    }),

    // Null-safe equality join (<=>): null keys match null keys, unlike `=`.
    "j10_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .select($"o_orderkey", expr("NULLIF(o_orderstatus, 'O')").as("k"))
      val dim = s.createDataFrame(Seq(
        (Option("F"), "finished"), (Option("P"), "partial"),
        (Option.empty[String], "open"))).toDF("k", "label")
      o.join(broadcast(dim), o("k") <=> dim("k"), "left")
        .select($"o_orderkey", o("k").as("status_k"), $"label")
    })
  )

  val oracles: Map[String, String] = Map(
    "win_lag_lead" ->
      ("""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
         |  lag(o_totalprice) OVER w AS prev_total,
         |  lead(o_totalprice) OVER w AS next_total,
         |  CAST(CAST(o_orderdate AS DATE) -
         |       CAST(lag(o_orderdate) OVER w AS DATE) AS INTEGER) AS days_since_prev
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),
    "win_rank_dense" ->
      ("""SELECT l_orderkey, CAST(l_linenumber AS INTEGER) AS l_linenumber,
         |  l_returnflag, l_linestatus,
         |  CAST(rank() OVER q AS INTEGER) AS qty_rank,
         |  CAST(dense_rank() OVER q AS INTEGER) AS qty_dense,
         |  CAST(ntile(4) OVER u AS INTEGER) AS price_quartile
         |FROM lineitem
         |WINDOW q AS (PARTITION BY l_returnflag, l_linestatus ORDER BY l_quantity),
         |       u AS (PARTITION BY l_returnflag, l_linestatus
         |             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)""".stripMargin),
    "win_percent_rank" ->
      ("""SELECT o_orderkey, o_orderstatus,
         |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderstatus
         |             ORDER BY o_totalprice, o_orderkey)""".stripMargin),
    "win_ntile" ->
      ("""SELECT o_orderkey, o_custkey, o_totalprice,
         |  CAST(ntile(4) OVER (PARTITION BY o_custkey
         |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS price_quartile
         |FROM orders""".stripMargin),
    "win_nth_value" ->
      ("""SELECT o_orderkey, o_custkey,
         |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_total
         |FROM orders""".stripMargin),
    "win_running_sum" ->
      ("""SELECT o_orderkey, o_custkey, o_orderdate,
         |  SUM(ROUND(o_totalprice * 100)) OVER w / 100.0 AS run_total,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS run_cnt
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |             ROWS UNBOUNDED PRECEDING)""".stripMargin),
    "win_range_frame" ->
      ("""SELECT o_orderkey, o_orderstatus, o_totalprice,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_near,
         |  SUM(ROUND(o_totalprice * 100)) OVER w / 100.0 AS near_total
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
         |             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)""".stripMargin),
    "sc_hash_funcs" ->
      ("SELECT c_custkey, MD5(c_name) AS h_md5, SHA256(c_name) AS h_sha256 " +
       "FROM customer"),
    "agg_bool_minmax_by" ->
      ("SELECT o_orderstatus, bool_and(o_totalprice > 1000) AS all_over_1k, " +
       "bool_or(o_totalprice > 500000) AS any_over_500k, " +
       "min_by(o_totalprice, o_orderkey) AS first_order_price, " +
       "max_by(o_totalprice, o_orderkey) AS last_order_price " +
       "FROM orders GROUP BY o_orderstatus"),
    "win_first_last" ->
      ("""SELECT o_orderkey, o_custkey,
         |  first_value(o_totalprice) OVER w AS first_total,
         |  last_value(o_totalprice) OVER w AS last_total,
         |  nth_value(o_totalprice, 2) OVER w AS second_total
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),
    "sc_bitwise_funcs" ->
      ("SELECT o_orderkey, o_orderkey & 255 AS low_byte, o_orderkey | 1 AS odd_or, " +
       "CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS keys_xor, " +
       "o_orderkey << 2 AS shl2, o_orderkey >> 3 AS shr3, " +
       "CAST(BIT_COUNT(o_orderkey) AS INTEGER) AS popcount FROM orders"),
    "set_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),
    "set_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),
    "set_except_all" ->
      ("SELECT o_custkey FROM orders WHERE o_totalprice > 100000 " +
       "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"),
    "u2_union_by_name" ->
      ("SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders " +
       "WHERE o_orderkey % 4 = 0 " +
       "UNION ALL SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus " +
       "FROM orders WHERE o_orderkey % 4 = 1"),
    "agg_string_agg" ->
      ("SELECT c_mktsegment, string_agg(CAST(c_custkey AS VARCHAR), ',' " +
       "ORDER BY CAST(c_custkey AS VARCHAR)) AS custkeys, " +
       "CAST(COUNT(*) AS BIGINT) AS n " +
       "FROM customer WHERE c_custkey <= 200 GROUP BY c_mktsegment"),
    "agg_pivot" ->
      ("SELECT l_returnflag, " +
       "SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f, " +
       "SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o " +
       "FROM lineitem GROUP BY l_returnflag"),
    "agg_grouping_sets" ->
      ("""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  CAST(COUNT(*) AS BIGINT) AS cnt,
         |  SUM(ROUND(o_totalprice * 100)) / 100.0 AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin),
    "agg_percentile_exact" ->
      ("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, " +
       "quantile_cont(l_quantity, 0.25) AS q25_qty, " +
       "quantile_cont(ROUND(l_extendedprice * 100), 0.9) AS p90_cents " +
       "FROM lineitem GROUP BY l_returnflag"),
    "sc_regex_funcs" ->
      ("SELECT c_custkey, " +
       "regexp_extract(c_name, '([0-9]+)$', 1) AS name_num, " +
       "regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked, " +
       "CAST(len(string_split(c_name, '#')) AS BIGINT) AS name_parts, " +
       "CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos, " +
       "starts_with(c_mktsegment, 'BUIL') AS is_building, " +
       "ends_with(c_name, '1') AS ends_one FROM customer"),
    "sub_scalar_avg" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
       "WHERE o_totalprice > (SELECT SUM(ROUND(o_totalprice * 100)) / 100.0 " +
       "/ COUNT(*) FROM orders)"),
    "sub_in_keys" ->
      ("SELECT o_orderkey, o_custkey FROM orders " +
       "WHERE o_custkey IN (SELECT c_custkey FROM customer " +
       "WHERE c_mktsegment = 'MACHINERY')"),
    "agg_unpivot" ->
      ("""WITH wide AS (
         |  SELECT l_returnflag,
         |    SUM(ROUND(l_extendedprice * 100)) / 100.0 AS price_total,
         |    SUM(l_quantity) AS qty_total,
         |    SUM(ROUND(l_tax * 100)) / 100.0 AS tax_total
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, value FROM wide
         |UNPIVOT (value FOR measure IN (price_total, qty_total, tax_total))""".stripMargin),
    "j10_nullsafe_join" ->
      ("""WITH o AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_k
         |           FROM orders),
         |dim(k, label) AS (VALUES ('F', 'finished'), ('P', 'partial'),
         |                         (NULL, 'open'))
         |SELECT o.o_orderkey, o.status_k, dim.label
         |FROM o LEFT JOIN dim ON o.status_k IS NOT DISTINCT FROM dim.k""".stripMargin)
  )
}
