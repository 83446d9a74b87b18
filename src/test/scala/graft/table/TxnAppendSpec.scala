package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** appendIdempotent — Delta txnAppId/txnVersion parity: replays of an
  * applied (appId, version) are no-ops, versions are monotonic per app,
  * apps are independent, and the commit-marker witness covers the crash
  * window between the data write and the version-file update.
  */
class TxnAppendSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("replays are no-ops; versions monotonic; apps independent") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("txn_basic"))
    assert(t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "etl", 1L))
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "s"), "etl", 2L))
    // replay of either applied version: no-op, no duplicate rows
    assert(!t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "etl", 1L))
    assert(!t.appendIdempotent(Seq((9L, "x")).toDF("id", "s"), "etl", 2L))
    // lower-than-recorded version: already covered by the high-water mark
    assert(!t.appendIdempotent(Seq((9L, "x")).toDF("id", "s"), "etl", 0L))
    // a DIFFERENT app's version space is independent
    assert(t.appendIdempotent(Seq((3L, "c")).toDF("id", "s"), "backfill", 1L))
    assert(t.appendIdempotent(Seq((4L, "d")).toDF("id", "s"), "etl", 3L))
    assert(t.read.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(t.lastTxnVersion("etl").contains(3L))
    assert(t.lastTxnVersion("backfill").contains(1L))
  }

  test("commit-marker witness covers a lost version file (the crash window)") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("txn_crash"))
    assert(t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "app", 7L))
    // simulate the crash-between-data-and-version-file state: the data
    // committed (marker present), the high-water file never landed
    val txn = new Path(t.commitsDir, "txns/app")
    txn.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(txn, false)
    assert(t.lastTxnVersion("app").isEmpty)
    assert(!t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "app", 7L),
      "history marker must witness the applied version")
    assert(t.read.count() == 1L, "no duplicate from the replay")
  }

  test("durable witness survives marker pruning when the high-water write is lost") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("txn_witness"))
    val fs = t.commitsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // crash AFTER the data write, BEFORE the high-water write: the thrown
    // failpoint releases the commit marker (withClaimedCommit's failure
    // path), so the durable txns_applied witness is the ONLY survivor —
    // exactly the state a real crash plus HistoryDepth marker prunings
    // leaves behind.
    MedallionTable.testFailpoint = {
      case "post-txn-append" =>
        MedallionTable.testFailpoint = _ => ()
        throw new RuntimeException("simulated crash before high-water write")
      case _ => ()
    }
    try intercept[RuntimeException] {
      t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "app", 7L)
    } finally MedallionTable.testFailpoint = _ => ()
    assert(t.read.count() == 1L, "the data write itself committed")
    assert(t.lastTxnVersion("app").isEmpty, "high-water write was lost")
    assert(fs.exists(new Path(t.commitsDir, "txns_applied/app-7")))
    // age the table far past marker retention — without the witness, the
    // replay below would duplicate (the round-11 ADVICE hazard)
    (0 until MedallionTable.HistoryDepth + 2).foreach { i =>
      t.append(Seq((100L + i, "filler")).toDF("id", "s"))
    }
    assert(!t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "app", 7L),
      "durable witness must outlive marker pruning")
    assert(t.read.filter($"id" === 1L).count() == 1L, "no duplicate")
    // a successful append retires its own witness: the directory holds
    // only failed-high-water survivors, not one file per batch
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "s"), "app", 8L))
    assert(!fs.exists(new Path(t.commitsDir, "txns_applied/app-8")))
  }

  test("in-process append failure rolls the witness back so the retry applies") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("txn_rollback"))
    val fs = t.commitsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bad = Seq((1L, "a")).toDF("id", "s")
      .withColumn("s", expr("raise_error('boom')"))
    intercept[Exception] { t.appendIdempotent(bad, "app", 1L) }
    assert(!fs.exists(new Path(t.commitsDir, "txns_applied/app-1")),
      "failed append must not leave a witness that blocks the retry")
    assert(t.appendIdempotent(Seq((1L, "a")).toDF("id", "s"), "app", 1L),
      "retry after an in-process failure must apply")
    assert(t.read.count() == 1L)
  }

  test("foreachBatch-style replay loop lands every batch exactly once") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("txn_loop"))
    // a retrying driver: every batch attempted twice
    (0L until 5L).foreach { b =>
      (1 to 2).foreach { _ =>
        t.appendIdempotent(Seq((b, s"batch$b")).toDF("id", "s"), "stream", b)
      }
    }
    assert(t.read.count() == 5L)
    assert(t.read.select(sum("id")).head().getLong(0) == 10L)
  }
}
