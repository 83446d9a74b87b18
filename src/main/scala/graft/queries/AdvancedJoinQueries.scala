package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, BloomJoin}

/** Advanced join operators beyond plain equi-joins: as-of (most recent
  * prior), range (interval containment), and bloom-pruned equi-join —
  * the time-series / feature-store / selective-dimension shapes a
  * large-scale pipeline leans on.
  */
object AdvancedJoinQueries {
  import Q.QueryFn

  val defs: Map[String, QueryFn] = Map(
    // As-of join: every click event enriched with the most recent prior (or
    // simultaneous) view of the same user. Right side pre-aggregated to one
    // row per (user, ts) so the match is deterministic.
    "j11_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts", $"value")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
      AsOfJoin.asOf(clicks, views, keyCols = Seq("user_id"), timeCol = "ts",
        payloadCols = Seq("view_value"))
    }),

    // The hot-key-safe as-of variant (time-bucketed salt + boundary
    // carry, operators/AsOfJoin.asOfSalted) on the SAME inputs and the
    // SAME oracle as j11 — proving cross-engine that the salted two-pass
    // carry reaches identical decisions to the single-window form.
    "j11b_asof_salted" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts", $"value")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
      AsOfJoin.asOfSalted(clicks, views, keyCols = Seq("user_id"),
        timeCol = "ts", payloadCols = Seq("view_value"), buckets = 16)
    }),

    // Forward as-of: each click enriched with the EARLIEST same-or-later
    // view of the same user ("what did they see next") — the reverse-time
    // twin of j11, same inputs, same one-window cost.
    "j11c_asof_forward" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts", $"value")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
      AsOfJoin.asOfForward(clicks, views, keyCols = Seq("user_id"),
        timeCol = "ts", payloadCols = Seq("view_value"))
    }),

    // Range join: orders tagged with their price band (broadcast interval
    // table, narrow map over the big side — no shuffle theta-join).
    "j12_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = s.createDataFrame(
        (0 until 12).map(i => (i, i * 50000.0, (i + 1) * 50000.0)))
        .toDF("band", "lo", "hi")
      AsOfJoin.rangeJoinBroadcast(
          Tables.orders(s, dir).select($"o_orderkey", $"o_totalprice"),
          bands, col("o_totalprice"), col("lo"), col("hi"))
        .select($"o_orderkey", $"o_totalprice", $"band")
    }),

    // Bloom-pruned selective join: BUILDING-segment customers against
    // orders; probe side filtered by the bloom before its shuffle.
    "j13_bloom_pruned_join" -> ((s, dir) => {
      import s.implicits._
      val bld = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name")
      BloomJoin.prunedInnerJoin(
          Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice"),
          bld, probeKey = "o_custkey", buildKey = "c_custkey",
          estimatedItems = 100000L)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"c_name")
    }),

    // Deliberate small×small cross join (completes join-type coverage;
    // the engine otherwise REJECTS accidental cross joins — plan specs
    // assert their absence elsewhere).
    "j15_cross_join_small" -> ((s, dir) => {
      val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      r.crossJoin(n)
    }),

    // Full outer join on partially-overlapping key ranges.
    "j16_full_outer" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.orders(s, dir).filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey".as("k"), $"o_totalprice".as("price_a"))
      val b = Tables.orders(s, dir).filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("status_b"))
      a.join(b, Seq("k"), "full_outer")
    }),

    // Right outer join (dim side preserved).
    "j17_right_join" -> ((s, dir) => {
      import s.implicits._
      val heavy = Tables.orders(s, dir).filter($"o_totalprice" > 400000)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      val c = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
      heavy.join(c, heavy("o_custkey") === c("c_custkey"), "right")
        .select($"c_custkey", $"c_mktsegment", $"o_orderkey", $"o_totalprice")
    }),

    // Salted skew join: fact side salted into 8 sub-keys, dim replicated —
    // result must equal the plain join exactly (oracle is the plain join).
    "j14_salted_skew_join" -> ((s, dir) => {
      import s.implicits._
      graft.operators.SkewJoin.saltedJoin(
          Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice"),
          Tables.customer(s, dir).select($"c_custkey".as("o_custkey"), $"c_mktsegment"),
          keys = Seq("o_custkey"), nSalts = 8)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"c_mktsegment")
    }),

    // Bucketed co-located join: both sides written as 8-bucket tables on
    // the join key, so the SortMergeJoin reads bucket k against bucket k
    // with NO Exchange on either side (ScaleSpec pins the plan shape) —
    // the layout that turns every recurring fact⋈fact join at 100 TB from
    // a full shuffle into a local merge. The merge hint (not a session
    // conf) keeps the demonstration on the SMJ path: the returned frame
    // plans lazily, after this function has returned.
    "j18_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      val po = Q.scratch(dir, "bk_orders")
      val pc = Q.scratch(dir, "bk_customer")
      s.sql("DROP TABLE IF EXISTS graft_bk_orders")
      s.sql("DROP TABLE IF EXISTS graft_bk_customer")
      Q.deleteDir(s, po)
      Q.deleteDir(s, pc)
      Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .write.option("path", po)
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_bk_orders")
      Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
        .write.option("path", pc)
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_bk_customer")
      s.table("graft_bk_orders").hint("merge")
        .join(s.table("graft_bk_customer"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"c_mktsegment")
    }),

    // Dynamic partition pruning — the star-schema runtime scan cut: the
    // fact side is hive-partitioned on blk and the dim side arrives
    // FILTERED, so Catalyst injects a runtime subquery into the fact
    // scan's PartitionFilters (ScaleSpec asserts `dynamicpruning` in the
    // plan) and only dim-selected partitions are listed/read. The static
    // twin (literal partition filter) is ScaleSpec's pruning test; at
    // 100 TB DPP is what keeps a fact⋈filtered-dim join from scanning
    // every partition.
    "j19_dpp_join" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "dpp_fact")
      Q.deleteDir(s, p)
      Tables.orders(s, dir).withColumn("blk", ($"o_orderkey" % 8).cast("int"))
        .write.partitionBy("blk").parquet(p)
      val dim = Tables.nation(s, dir)
        .select($"n_nationkey".cast("int").as("blk"), $"n_name")
        .filter($"blk" < 3)
      s.read.parquet(p).join(dim, Seq("blk"))
        .select($"o_orderkey", $"blk", $"n_name")
    }),

    // Deterministic hash-mod sampling (content-addressed ≈25% sample) —
    // the reproducible cross-engine form of TABLESAMPLE.
    "s6_sample_hash_mod" -> ((s, dir) => {
      Tables.orders(s, dir)
        .where("SUBSTRING(MD5(CAST(o_orderkey AS STRING)), 1, 1) IN ('0','1','2','3')")
        .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // posexplode (lateral flatten with ordinality) of the token arrays.
    "sc_posexplode_tokens" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).filter($"doc_id" < 50)
        .selectExpr("doc_id", s"posexplode(${Q.TokensExpr}) AS (pos, tok)")
    }),

    // explode_outer: rows with an EMPTY array survive with a NULL token
    // (plain explode drops them — the silent row-loss trap of generator
    // pipelines). Empty arrays are synthesized deterministically since
    // every fixture doc tokenizes non-empty.
    "sc_explode_outer" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).filter($"doc_id" < 50)
        .selectExpr("doc_id",
          s"CASE WHEN SIZE(${Q.TokensExpr}) < 12 THEN SLICE(${Q.TokensExpr}, 1, 0) " +
            s"ELSE SLICE(${Q.TokensExpr}, 1, 3) END AS toks")
        .selectExpr("doc_id", "EXPLODE_OUTER(toks) AS tok")
    })
  )

  val oracles: Map[String, String] = Map(
    "j11_asof_join" ->
      ("""WITH v AS (SELECT user_id, ts, MAX(value) AS view_value
         |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |c AS (SELECT event_id, user_id, ts, value
         |      FROM events WHERE event_type = 'click')
         |SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts, c.value,
         |       v.view_value
         |FROM c ASOF LEFT JOIN v
         |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin),
    "j11b_asof_salted" ->
      ("""WITH v AS (SELECT user_id, ts, MAX(value) AS view_value
         |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |c AS (SELECT event_id, user_id, ts, value
         |      FROM events WHERE event_type = 'click')
         |SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts, c.value,
         |       v.view_value
         |FROM c ASOF LEFT JOIN v
         |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin),
    "j11c_asof_forward" ->
      ("""WITH v AS (SELECT user_id, ts, MAX(value) AS view_value
         |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |c AS (SELECT event_id, user_id, ts, value
         |      FROM events WHERE event_type = 'click')
         |SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts, c.value,
         |       v.view_value
         |FROM c ASOF LEFT JOIN v
         |  ON c.user_id = v.user_id AND c.ts <= v.ts""".stripMargin),
    "j12_range_join" ->
      ("""WITH bands(band, lo, hi) AS (
         |  SELECT i, i * 50000.0, (i + 1) * 50000.0 FROM range(12) t(i))
         |SELECT o_orderkey, o_totalprice, CAST(band AS INTEGER) AS band
         |FROM orders LEFT JOIN bands
         |  ON o_totalprice >= lo AND o_totalprice < hi""".stripMargin),
    "j13_bloom_pruned_join" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, c_name " +
       "FROM orders JOIN customer ON o_custkey = c_custkey " +
       "WHERE c_mktsegment = 'BUILDING'"),
    "j14_salted_skew_join" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment " +
       "FROM orders JOIN customer ON o_custkey = c_custkey"),
    "j18_bucketed_join" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment " +
       "FROM orders JOIN customer ON o_custkey = c_custkey"),
    "j19_dpp_join" ->
      ("SELECT o_orderkey, CAST(o_orderkey % 8 AS INTEGER) AS blk, n_name " +
       "FROM orders JOIN nation ON o_orderkey % 8 = n_nationkey " +
       "WHERE n_nationkey < 3"),
    "j15_cross_join_small" ->
      ("SELECT r_regionkey, r_name, n_nationkey, n_name " +
       "FROM region CROSS JOIN nation"),
    "j16_full_outer" ->
      ("""SELECT COALESCE(a.k, b.k) AS k, a.price_a, b.status_b FROM
         |(SELECT o_orderkey AS k, o_totalprice AS price_a FROM orders
         | WHERE o_orderkey % 3 = 0) a
         |FULL OUTER JOIN
         |(SELECT o_orderkey AS k, o_orderstatus AS status_b FROM orders
         | WHERE o_orderkey % 2 = 0) b ON a.k = b.k""".stripMargin),
    "j17_right_join" ->
      ("SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice " +
       "FROM (SELECT o_custkey, o_orderkey, o_totalprice FROM orders " +
       "WHERE o_totalprice > 400000) o " +
       "RIGHT JOIN customer ON o.o_custkey = c_custkey"),
    "s6_sample_hash_mod" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "WHERE SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')"),
    "sc_posexplode_tokens" ->
      ("""SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
         |       unnest(toks) AS tok
         |FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
         |      FROM documents WHERE doc_id < 50)""".stripMargin),
    "sc_explode_outer" ->
      ("""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 12 THEN toks[1:0] ELSE toks[1:3] END AS toks2
         |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
         |        FROM documents WHERE doc_id < 50))
         |SELECT t.doc_id, u.tok
         |FROM t LEFT JOIN LATERAL (SELECT unnest(toks2) AS tok) u ON true""".stripMargin)
  )
}
