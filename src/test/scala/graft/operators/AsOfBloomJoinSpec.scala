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
