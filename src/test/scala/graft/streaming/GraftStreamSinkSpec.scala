package graft.streaming

import graft.SparkSpec
import graft.table.MedallionTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** `writeStream.format("graft")` ([[GraftStreamSink]] via
  * [[graft.sources.GraftSqlSource]]): exactly-once micro-batch appends
  * through the table layer's txnAppId/txnVersion machinery, restart
  * dedup, output-mode and option refusals, and composition with the
  * table's own gates (constraints, CDF capture).
  */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ckptDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("micro-batches append exactly once; restart with the same " +
      "checkpoint re-delivers nothing") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink1")
    val ckpt = ckptDir("gsink1_ck")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      val t = MedallionTable(spark, p)
      assert(t.read.count() == 3)
    } finally q.stop()
    // restart on the SAME checkpoint: committed epochs are skipped by
    // the recorded txn version, new data lands once
    val input2 = MemoryStream[(Long, String)]
    input2.addData((1L, "a"), (2L, "b"), (3L, "c")) // replayed world
    val q2 = input2.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("gsink1_ck2"))
      .option("txnAppId", ckpt) // same replay identity, new checkpoint dir
      .start()
    try {
      q2.processAllAvailable()
      val t = MedallionTable(spark, p)
      // batch 0 of the new query carries the same (appId, version=0) as
      // the original query's first epoch — skipped, no duplicates
      assert(t.read.count() == 3)
    } finally q2.stop()
  }

  test("update/complete output modes and missing options refuse with " +
      "the hatch named") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("id", "s").groupBy("s").count()
    val em = intercept[Exception] {
      agg.writeStream.format("graft").option("path", tmpDir("gsink2"))
        .option("checkpointLocation", ckptDir("gsink2_ck"))
        .outputMode(OutputMode.Update).start()
    }
    assert(em.getMessage.contains("Append output mode only"))
    val ep = intercept[Exception] {
      input.toDF().toDF("id", "s").writeStream.format("graft")
        .option("checkpointLocation", ckptDir("gsink3_ck")).start()
    }
    assert(ep.getMessage.contains("path"))
  }

  test("the table's write gates apply per micro-batch: a NOT NULL " +
      "violation fails the stream and no partial batch lands") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink4")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    t.setNotNull("s")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("gsink4_ck"))
      .start()
    try {
      input.addData((1L, "ok"))
      q.processAllAvailable()
      assert(t.read.count() == 2)
      input.addData((2L, null: String))
      intercept[Exception](q.processAllAvailable())
      assert(t.read.count() == 2) // violating epoch left nothing behind
    } finally q.stop()
  }

  test("CDF captures sink appends as insert commits; partitioned sink " +
      "lands hive layout") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink5")
    val t = MedallionTable(spark, p, Seq("g"))
    t.overwrite(Seq((0L, "x", 0)).toDF("id", "s", "g"))
    t.enableChangeDataFeed()
    val input = MemoryStream[(Long, String, Int)]
    val q = input.toDF().toDF("id", "s", "g").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("gsink5_ck"))
      .partitionBy("g").start()
    try {
      input.addData((1L, "a", 1), (2L, "b", 2))
      q.processAllAvailable()
      assert(t.read.count() == 3)
      val feed = t.readChangeFeed(t.commitVersion)
      assert(feed.filter($"_change_type" === "insert")
        .select("id").as[Long].collect().toSet == Set(1L, 2L))
      // hive layout: the partition dir exists
      assert(new java.io.File(s"$p/g=1").exists())
    } finally q.stop()
  }
}
