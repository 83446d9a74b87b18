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
