package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardShuffleSpec extends SparkSpec {

  test("layout is a pure function of (ids, seed, nShards); positions are 1..|shard|") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val a = ShardShuffle.assign(ids, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // re-run on a differently-partitioned input: identical layout
    val b = ShardShuffle.assign(ids.repartition(13), "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b, "layout must not depend on input partitioning")
    // every shard's positions are exactly 1..|shard| (dense, 1-based)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size),
        s"shard $shard positions not dense")
    }
    // a different seed reshuffles (at least one doc moves or reorders)
    val c = ShardShuffle.assign(ids, "doc_id", nShards = 8, seed = "43")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a != c, "seed must change the layout")
    // md5-uniform assignment: no shard is pathologically over-full
    val sizes = a.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.max < 2 * 500 / 8, s"skewed shards: ${sizes.toMap}")
  }

  test("within-shard order is hash-shuffled, not id order, and consecutive ids spread") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val out = ShardShuffle.assign(ids, "doc_id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // inside some shard, position order must disagree with doc_id order
    val disagree = out.groupBy(_._2).values.exists { rows =>
      val byPos = rows.sortBy(_._3).map(_._1).toSeq
      byPos != byPos.sorted
    }
    assert(disagree, "within-shard order should not be id order")
  }

  test("plan: window partitions by shard_id — no single-task global sort") {
    import spark.implicits._
    val out = ShardShuffle.assign((0L until 100L).toDF("doc_id"), "doc_id", 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard_id"),
      s"window must partition by shard_id:\n$plan")
    assert(!plan.contains("SinglePartition"), s"global funnel in plan:\n$plan")
  }
}
