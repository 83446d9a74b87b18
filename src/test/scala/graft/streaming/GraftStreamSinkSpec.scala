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
      .option("path", p).option("checkpointLocation", ckpt)
      .option("txnAppId", "gsink1-app").start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      val t = MedallionTable(spark, p)
      assert(t.read.count() == 3)
    } finally q.stop()
    // restart on the same explicit replay identity: committed epochs are
    // skipped by the recorded txn version, new data lands once
    val input2 = MemoryStream[(Long, String)]
    input2.addData((1L, "a"), (2L, "b"), (3L, "c")) // replayed world
    val q2 = input2.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("gsink1_ck2"))
      .option("txnAppId", "gsink1-app") // same identity, new checkpoint dir
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

  /** Simulate a crash AFTER the table commit but BEFORE Spark's own
    * commit-log entry: delete the newest commit-log file, so a restart
    * replays that epoch into the sink and the table-layer txn dedup is
    * what must catch it.
    */
  private def dropLatestCommitLogEntry(ckpt: String): Unit = {
    val commits = new java.io.File(s"$ckpt/commits")
    val latest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    // the checksum sidecar must go too: a leftover .N.crc fails the
    // replay's rename, which Spark misreads as a concurrent query
    new java.io.File(commits, s".${latest.getName}.crc").delete()
    latest.delete()
  }

  test("appId keys the RESOLVED checkpoint location: a crash-replay " +
      "restarted under a file: URI spelling of the same dir lands once") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink6")
    val ckpt = ckptDir("gsink6_ck")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(MedallionTable(spark, p).read.count() == 2)
    } finally q.stop()
    dropLatestCommitLogEntry(ckpt)
    // restart the SAME checkpoint under a different spelling — a raw
    // string hash would mint a new appId and double-apply the replay
    val input2 = MemoryStream[(Long, String)]
    input2.addData((1L, "a"), (2L, "b"))
    val q2 = input2.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", s"file:$ckpt").start()
    try {
      q2.processAllAvailable()
      assert(MedallionTable(spark, p).read.count() == 2,
        "crash-replayed epoch duplicated under a respelled checkpoint")
    } finally q2.stop()
  }

  test("conf-only checkpoint (no sink option) falls back to the " +
      "streaming query id; crash-replayed epoch still lands once") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink7")
    val root = ckptDir("gsink7_ck")
    spark.conf.set("spark.sql.streaming.checkpointLocation", root)
    try {
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("id", "s").writeStream.format("graft")
        .option("path", p).queryName("gsink7q").start()
      try {
        input.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        assert(MedallionTable(spark, p).read.count() == 2)
      } finally q.stop()
      dropLatestCommitLogEntry(s"$root/gsink7q")
      // the query id is persisted in the checkpoint metadata — the
      // restart reuses it, so the replayed epoch dedups with no
      // checkpoint path in scope at all
      val input2 = MemoryStream[(Long, String)]
      input2.addData((1L, "a"), (2L, "b"))
      val q2 = input2.toDF().toDF("id", "s").writeStream.format("graft")
        .option("path", p).queryName("gsink7q").start()
      try {
        q2.processAllAvailable()
        assert(MedallionTable(spark, p).read.count() == 2,
          "crash-replayed epoch duplicated under the query-id appId")
      } finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }

  test("sink schema evolution: a redeployed stream adding a column " +
      "refuses by default, evolves under mergeSchema=true, and a " +
      "reverting stream lands typed NULLs") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink8")
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("g8a"))
      .start()
    try { in1.addData((1L, "a")); q1.processAllAvailable() }
    finally q1.stop()
    // evolving redeploy WITHOUT the option refuses, nothing lands
    val in2 = MemoryStream[(Long, String, Int)]
    val qBad = in2.toDF().toDF("id", "s", "extra").writeStream
      .format("graft").option("path", p)
      .option("checkpointLocation", ckptDir("g8b")).start()
    try {
      in2.addData((2L, "b", 7))
      val e = intercept[Exception](qBad.processAllAvailable())
      assert(e.getMessage.contains("mergeSchema"))
    } finally qBad.stop()
    assert(MedallionTable(spark, p).read.count() == 1)
    // with mergeSchema=true the same epoch evolves the table
    val in3 = MemoryStream[(Long, String, Int)]
    val q3 = in3.toDF().toDF("id", "s", "extra").writeStream
      .format("graft").option("path", p)
      .option("checkpointLocation", ckptDir("g8c"))
      .option("mergeSchema", "true").start()
    try { in3.addData((2L, "b", 7)); q3.processAllAvailable() }
    finally q3.stop()
    val t = MedallionTable(spark, p)
    assert(t.read.columns.toSet == Set("id", "s", "extra"))
    assert(t.read.schema("extra").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // pre-evolution row reads the new column as a typed NULL
    assert(t.read.filter($"id" === 1L).select("extra").head.isNullAt(0))
    // reverting redeploy (no extra column) needs no option — missing
    // columns always pass — and its rows read extra as typed NULL
    val in4 = MemoryStream[(Long, String)]
    val q4 = in4.toDF().toDF("id", "s").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("g8d"))
      .start()
    try { in4.addData((3L, "c")); q4.processAllAvailable() }
    finally q4.stop()
    assert(t.read.count() == 3)
    assert(t.read.filter($"id" === 3L).select("extra").head.isNullAt(0))
    assert(t.read.filter($"id" === 2L).select("extra").head.getInt(0) == 7)
  }

  test("NOT NULL gate refuses a sink epoch that OMITS the constrained " +
      "column entirely") {
    implicit val sqlCtx = spark.sqlContext
    val p = tmpDir("gsink9")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "seed")).toDF("id", "s"))
    t.setNotNull("s")
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("id").writeStream.format("graft")
      .option("path", p).option("checkpointLocation", ckptDir("g9_ck"))
      .start()
    try {
      input.addData(1L)
      intercept[Exception](q.processAllAvailable())
      assert(t.read.count() == 1) // nothing landed
    } finally q.stop()
  }

  test("legacy raw-string txn records migrate to the qualified-URI " +
      "appId: the first post-upgrade epoch replays with dedup intact") {
    val p = tmpDir("gsink10")
    val t = MedallionTable(spark, p)
    def md5(raw: String): String = "sink-" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rawCkpt = ckptDir("g10_ck") // absolute local path, unqualified
    val legacyId = md5(rawCkpt)     // what the pre-upgrade sink hashed
    val hp = new org.apache.hadoop.fs.Path(rawCkpt)
    val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val u = hfs.makeQualified(hp).toUri
    val newId = md5(
      s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}")
    assert(legacyId != newId, "fixture must exercise a spelling change")
    // pre-upgrade state: epochs 0..2 committed under the LEGACY appId
    (0 to 2).foreach { v =>
      assert(t.appendIdempotent(Seq((v.toLong, s"e$v")).toDF("id", "s"),
        legacyId, v))
    }
    assert(t.read.count() == 3)
    // post-upgrade sink instance resolving the SAME checkpoint: addBatch
    // must migrate the legacy record before its first dedup check, so the
    // replayed last epoch (2) is skipped, and genuinely-new epochs land
    val sink = new GraftStreamSink(p, Nil, Some(newId), false,
      Some(legacyId))
    sink.addBatch(2, Seq((2L, "e2")).toDF("id", "s")) // replay: no dup
    assert(t.read.count() == 3,
      "post-upgrade replay duplicated the last committed micro-batch")
    sink.addBatch(3, Seq((3L, "e3")).toDF("id", "s"))
    assert(t.read.count() == 4)
    assert(t.lastTxnVersion(newId).contains(3L))
    // a table that already has a record under the new appId never takes
    // the legacy value backwards
    t.migrateTxnRecord(legacyId, newId)
    assert(t.lastTxnVersion(newId).contains(3L))
  }
}
