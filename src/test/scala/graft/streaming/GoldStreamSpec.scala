package graft.streaming

import graft.SparkSpec
import graft.table.{IncrementalAgg, MedallionTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental gold maintenance (EventStreams.goldStream): after
  * every micro-batch the gold table equals a full recompute over the fact
  * table, including across group moves and OUT-OF-BAND fact writes the
  * stream never saw (the ordinal-bookkeeping self-healing property).
  */
class GoldStreamSpec extends SparkSpec {

  private val grp = Seq("g")
  private val sums = Seq("cents" -> col("cents"))

  private def goldNow(factPath: String, goldPath: String): Set[Seq[Any]] =
    MedallionTable(spark, goldPath).read.drop("_fact_commit")
      .collect().map(_.toSeq).toSet

  private def recompute(factPath: String): Set[Seq[Any]] =
    IncrementalAgg.fullCompute(MedallionTable(spark, factPath).read, grp, sums)
      .collect().map(_.toSeq).toSet

  test("gold tracks the fact across inserts, updates, moves, and out-of-band writes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val factPath = tmpDir("gold_stream_fact")
    val goldPath = tmpDir("gold_stream_gold")
    val ckpt = tmpDir("gold_stream_ckpt")
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStreams.goldStream(input.toDF().toDF("id", "g", "cents"),
      factPath, goldPath, Seq("id"), grp, sums, ckpt)
    try {
      input.addData((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      q.processAllAvailable()
      assert(goldNow(factPath, goldPath) == recompute(factPath))
      assert(goldNow(factPath, goldPath) == Set(Seq("a", 2L, 30L), Seq("b", 1L, 30L)))

      // update id=1 in place, MOVE id=3 b→c, insert id=4
      input.addData((1L, "a", 11L), (3L, "c", 30L), (4L, "b", 40L))
      q.processAllAvailable()
      assert(goldNow(factPath, goldPath) == recompute(factPath))
      assert(goldNow(factPath, goldPath) ==
        Set(Seq("a", 2L, 31L), Seq("b", 1L, 40L), Seq("c", 1L, 30L)))

      // OUT-OF-BAND writer: a delete the stream never observes — the next
      // batch's ordinal-based refresh must absorb it anyway
      // out-of-band writers must carry the same retention — a low-retention
      // handle would prune the snapshot the next refresh diffs against
      MedallionTable(spark, factPath, retainVersions = 3).delete($"g" === "b")
      input.addData((5L, "c", 50L))
      q.processAllAvailable()
      assert(goldNow(factPath, goldPath) == recompute(factPath))
      assert(goldNow(factPath, goldPath) ==
        Set(Seq("a", 2L, 31L), Seq("c", 2L, 80L)))
    } finally q.stop()
  }

  test("batch catchUp bootstraps, absorbs any fact writes, and is idempotent") {
    import spark.implicits._
    val factPath = tmpDir("gold_catchup_fact")
    val goldPath = tmpDir("gold_catchup_gold")
    val fact = MedallionTable(spark, factPath, retainVersions = 3)
    val gold = MedallionTable(spark, goldPath)
    fact.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "cents"))
    IncrementalAgg.catchUp(fact, gold, Seq("id"), grp, sums) // bootstrap
    assert(goldNow(factPath, goldPath) == recompute(factPath))
    // two fact mutations between refreshes, from different "writers"
    fact.merge(Seq((2L, "b", 25L), (3L, "c", 30L)).toDF("id", "g", "cents"),
      Seq("id"), deleteNotMatchedBySource = false)
    fact.delete($"g" === "a")
    IncrementalAgg.catchUp(fact, gold, Seq("id"), grp, sums)
    assert(goldNow(factPath, goldPath) == recompute(factPath))
    assert(goldNow(factPath, goldPath) == Set(Seq("b", 1L, 25L), Seq("c", 1L, 30L)))
    // re-running with no fact changes is a no-op on the content
    IncrementalAgg.catchUp(fact, gold, Seq("id"), grp, sums)
    assert(goldNow(factPath, goldPath) == Set(Seq("b", 1L, 25L), Seq("c", 1L, 30L)))
  }

  test("replaying an already-applied state transition is a no-op on the gold") {
    import spark.implicits._
    val factPath = tmpDir("gold_replay_fact")
    val goldPath = tmpDir("gold_replay_gold")
    val fact = MedallionTable(spark, factPath, retainVersions = 3)
    fact.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "cents"))
    val gold = MedallionTable(spark, goldPath)
    gold.overwrite(IncrementalAgg.fullCompute(fact.read, grp, sums)
      .withColumn("_fact_commit", lit(fact.commitVersion)))
    // the foreachBatch body's refresh step, replayed twice against an
    // unchanged fact: changesSinceOrdinal(reflected) is empty both times
    (1 to 2).foreach { _ =>
      val reflected = gold.read.select("_fact_commit").head.getLong(0)
      val changes = fact.changesSinceOrdinal(reflected, Seq("id"))
      gold.overwrite(IncrementalAgg.refresh(gold.read.drop("_fact_commit"),
        changes, grp, sums).withColumn("_fact_commit", lit(fact.commitVersion)))
    }
    assert(goldNow(factPath, goldPath) == recompute(factPath))
  }
}
