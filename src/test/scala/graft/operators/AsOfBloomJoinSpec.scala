package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** AsOfJoin: inclusive most-recent-prior semantics, per-key isolation, no
  * cross-join in the plan. BloomJoin: exact equality with the plain join,
  * probe-side filter visible in the plan.
  */
class AsOfBloomJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf matches the most recent right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 99.0),
      (2L, ts("2024-01-01 10:02:00"), 50.0)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:03:00")), // after 10:00 quote
      (11L, 1L, ts("2024-01-01 10:05:00")), // equal ts: inclusive match
      (12L, 1L, ts("2024-01-01 10:30:00")), // latest quote
      (13L, 2L, ts("2024-01-01 10:01:00")), // before any quote of user 2
      (14L, 3L, ts("2024-01-01 10:00:00"))  // user with no quotes at all
    ).toDF("trade_id", "user_id", "ts")

    val out = AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      10L -> Some(100.0), 11L -> Some(101.0), 12L -> Some(99.0),
      13L -> None, 14L -> None))
  }

  test("asOfForward matches the earliest right row at or after each left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 99.0),
      (2L, ts("2024-01-01 10:02:00"), 50.0)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:03:00")), // next quote is 10:05
      (11L, 1L, ts("2024-01-01 10:05:00")), // equal ts: inclusive match
      (12L, 1L, ts("2024-01-01 10:30:00")), // nothing follows
      (13L, 2L, ts("2024-01-01 10:01:00")), // 10:02 quote follows
      (14L, 3L, ts("2024-01-01 10:00:00"))  // user with no quotes at all
    ).toDF("trade_id", "user_id", "ts")

    val out = AsOfJoin.asOfForward(trades, quotes, Seq("user_id"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      10L -> Some(101.0), 11L -> Some(101.0), 12L -> None,
      13L -> Some(50.0), 14L -> None))
  }

  test("asOfForward matches a brute-force reference model on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val quotes = (0 until 400).map { i =>
      (rnd.nextInt(8).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextInt(1000).toDouble)
    }.distinct
      .groupBy(q => (q._1, q._2)).map { case ((u, t), vs) => (u, t, vs.map(_._3).max) }
      .toSeq
    val trades = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(10).toLong,
        ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30"))
    }
    val got = AsOfJoin.asOfForward(trades.toDF("trade_id", "user_id", "ts"),
        quotes.toDF("user_id", "ts", "px"), Seq("user_id"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val byUser = quotes.groupBy(_._1)
    val expected = trades.map { case (tid, u, t) =>
      tid -> byUser.getOrElse(u, Seq.empty)
        .filter(q => !q._2.before(t))
        .sortBy(_._2.getTime)
        .headOption.map(_._3)
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty),
      "fixture must exercise both matched and unmatched trades")
  }

  test("asOf matches a brute-force reference model on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val quotes = (0 until 400).map { i =>
      (rnd.nextInt(8).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextInt(1000).toDouble)
    }.distinct
      // unique per (key, time): keep max px like the operator contract asks
      .groupBy(q => (q._1, q._2)).map { case ((u, t), vs) => (u, t, vs.map(_._3).max) }
      .toSeq
    val trades = (0 until 300).map { i =>
      (1000L + i, rnd.nextInt(10).toLong, // users 8,9 have no quotes
        ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30"))
    }
    val qDf = quotes.toDF("user_id", "ts", "px")
    val tDf = trades.toDF("trade_id", "user_id", "ts")

    val got = AsOfJoin.asOf(tDf, qDf, Seq("user_id"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val byUser = quotes.groupBy(_._1)
    val expected = trades.map { case (tid, u, t) =>
      tid -> byUser.getOrElse(u, Seq.empty)
        .filter(q => !q._2.after(t))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
    }.toMap
    assert(got == expected)
    assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty),
      "fixture must exercise both matched and unmatched trades")
  }

  test("asOf carries a matched right row's NULL payload field as null, atomically") {
    import spark.implicits._
    // The matched (latest-prior) quote has px=null, qty=7: per-column
    // last(ignoreNulls) would skip the null px and splice in the OLDER
    // row's 100.0 — mixing payload values from two different right rows.
    // The struct carry must emit (null, 7) from the single matched row.
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some(3L)),
      (1L, ts("2024-01-01 10:05:00"), None, Some(7L))
    ).toDF("user_id", "ts", "px", "qty")
    val trades = Seq((10L, 1L, ts("2024-01-01 10:06:00")))
      .toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", Seq("px", "qty"))
      .select("trade_id", "px", "qty").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 10L)
    assert(r.isNullAt(1), s"null px must come through as null, got ${r.get(1)}")
    assert(r.getLong(2) == 7L)
  }

  test("asOfSalted equals asOf on hot-keyed randomized data, all bucket counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // key 1 is HOT: 80% of all rows — the straggler case the salt exists
    // for. Quotes unique per (key, time) per the operator contract.
    val quotes = (0 until 500).map { _ =>
      val u = if (rnd.nextInt(10) < 8) 1L else 2L + rnd.nextInt(3)
      (u, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        rnd.nextInt(1000).toDouble)
    }.groupBy(q => (q._1, q._2)).map { case ((u, t), vs) => (u, t, vs.map(_._3).max) }
      .toSeq
    val trades = (0 until 400).map { i =>
      val u = if (rnd.nextInt(10) < 8) 1L else 2L + rnd.nextInt(4)
      (1000L + i, u, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30"))
    }
    val qDf = quotes.toDF("user_id", "ts", "px")
    val tDf = trades.toDF("trade_id", "user_id", "ts")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val plain = run(AsOfJoin.asOf(tDf, qDf, Seq("user_id"), "ts", Seq("px")))
    // 1 bucket (degenerate = plain), a divisor-free count, and many-buckets
    // (most buckets empty on the cold keys) must all agree exactly.
    for (b <- Seq(1, 7, 64)) {
      val salted = run(AsOfJoin.asOfSalted(tDf, qDf, Seq("user_id"), "ts",
        Seq("px"), buckets = b))
      assert(salted == plain, s"buckets=$b diverged from the single-window as-of")
    }
  }

  test("asOfSalted matches asOf on NULL keys and NULL times") {
    import spark.implicits._
    // window partitioning groups NULL keys into one partition; the salted
    // carry joins must be null-safe or those rows silently lose their
    // carry-in (round-8 review finding)
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 01:00:00")), 10.0),
      (None, Some(ts("2024-01-01 02:00:00")), 20.0),
      (None, Some(ts("2024-01-03 02:00:00")), 21.0),
      (Some(2L), None, 30.0)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (100L, Some(1L), Some(ts("2024-01-05 01:00:00"))),
      (101L, None, Some(ts("2024-01-05 02:00:00"))), // null key, late bucket
      (102L, None, Some(ts("2024-01-01 03:00:00"))), // null key, early bucket
      (103L, Some(2L), None)                         // null time
    ).toDF("trade_id", "user_id", "ts")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val plain = run(AsOfJoin.asOf(trades, quotes, Seq("user_id"), "ts", Seq("px")))
    val salted = run(AsOfJoin.asOfSalted(trades, quotes, Seq("user_id"), "ts",
      Seq("px"), buckets = 16))
    assert(salted == plain, s"null-key/null-time divergence: $salted vs $plain")
    assert(plain(101L) == Some(21.0) && plain(102L) == Some(20.0),
      "fixture must exercise the null-key cross-bucket carry")
  }

  test("asOfSalted carries across empty and right-free buckets") {
    import spark.implicits._
    // One early quote, then a long quiet span, trades at the far end:
    // every late trade's bucket has NO right rows, so its match comes
    // entirely from the boundary carry-in.
    val quotes = Seq((1L, ts("2024-01-01 00:00:00"), 42.0)).toDF("user_id", "ts", "px")
    val trades = (0 until 10).map(i =>
      (100L + i, 1L, ts(f"2024-01-07 ${i * 2}%02d:00:00"))).toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.asOfSalted(trades, quotes, Seq("user_id"), "ts",
      Seq("px"), buckets = 32).select("trade_id", "px").collect()
    assert(out.length == 10 && out.forall(r => r.getDouble(1) == 42.0),
      "carry-in must bridge buckets with no right rows")
  }

  test("asOfSalted windows partition on (key, bucket) — the hot key is split") {
    import spark.implicits._
    val l = (0 until 100).map(i => (1L, ts(f"2024-01-01 ${i % 24}%02d:00:30"), i))
      .toDF("k", "ts", "payload_l")
    val r = (0 until 100).map(i => (1L, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i * 1.0))
      .groupBy(q => (q._1, q._2)).map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }
      .toSeq.toDF("k", "ts", "v")
    val plan = AsOfJoin.asOfSalted(l, r, Seq("k"), "ts", Seq("v"), buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"),
      s"pass-1 window must include the salt bucket in its partitioning:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"salted as-of must stay union+window+equi-join:\n$plan")
  }

  test("asOf plan has no cartesian/broadcast-nested-loop join") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("k", "ts", "payload_l")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    val plan = AsOfJoin.asOf(l, r, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must be union+window, not a theta join:\n$plan")
  }

  test("bloom-pruned join equals the plain join exactly") {
    import spark.implicits._
    val probe = (0L until 2000L).map(i => (i, i % 100)).toDF("pk", "fk")
    val build = Seq((3, "x"), (7, "y"), (900, "z")).map { case (k, v) => (k.toLong, v) }
      .toDF("bk", "name")
    val pruned = BloomJoin.prunedInnerJoin(probe, build, "fk", "bk")
      .select("pk", "fk", "bk", "name")
    val plain = probe.join(build, $"fk" === $"bk").select("pk", "fk", "bk", "name")
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == 40) // fk∈{3,7}: 20 rows each; 900 matches none
  }

  test("bloom filter prunes non-matching probe rows before the join") {
    import spark.implicits._
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // the bloom filter at optimization time and hide it from the plan
    val probe = spark.range(1000).select($"id".as("pk"), $"id".as("fk"))
    val build = Seq((5L, "only")).toDF("bk", "name")
    val out = BloomJoin.prunedInnerJoin(probe, build, "fk", "bk")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"probe-side bloom filter missing:\n$plan")
    assert(out.count() == 1)
  }
}
