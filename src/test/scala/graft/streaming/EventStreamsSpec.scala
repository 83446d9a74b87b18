package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60L * 1000L)
  private def ev(id: Long, min: Int, user: Long, typ: String, v: Double) =
    Event(id, ts(min), user, typ, v, "{}")

  test("watermarked windowed counts emit closed windows (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF(), watermark = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 5, 1, "click", 1.0), ev(2, 20, 1, "click", 2.0),
        ev(3, 40, 2, "view", 3.0))
      q.processAllAvailable()
      // nothing closed yet — watermark at 40-10=30min, window [0,60) still open
      assert(spark.table("win_counts").count() == 0)
      input.addData(ev(4, 80, 1, "click", 4.0)) // watermark → 70 ≥ 60: closes [0,60)
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set((0L, "click", 2L, 3.0), (0L, "view", 1L, 3.0)))
      // late event behind the watermark is dropped
      input.addData(ev(5, 15, 9, "click", 9.0), ev(6, 200, 1, "click", 1.0))
      q.processAllAvailable()
      val byType = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1))).toSet
      assert(!byType.contains((0L, "click")) || spark.table("win_counts")
        .where("window_start = timestamp '1970-01-01 00:00:00' AND event_type='click'")
        .count() == 1, "late event must not reopen the closed window")
    } finally q.stop()
  }

  test("streaming CDC replication: mirror tracks the source table " +
      "exactly-once, including out-of-band feed-captured churn") {
    import spark.implicits._
    import graft.table.MedallionTable
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val src = tmpDir("cdcm_src")
    val mir = tmpDir("cdcm_mir")
    val q = cdcMirrorStream(input.toDF(), src, mir, Seq("event_id"),
      tmpDir("cdcm_ck"))
    def mirrorEq(): Unit = {
      val a = MedallionTable(spark, mir).read
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val b = MedallionTable(spark, src).read
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(a == b && a.nonEmpty, "mirror ≡ source")
    }
    try {
      input.addData(ev(1, 1, 1, "c", 1.0), ev(2, 2, 1, "c", 2.0))
      q.processAllAvailable()
      mirrorEq()
      // update + insert through the stream
      input.addData(ev(1, 3, 1, "c", 9.0), ev(3, 4, 2, "v", 3.0))
      q.processAllAvailable()
      mirrorEq()
      assert(MedallionTable(spark, mir).read
        .filter($"event_id" === 1L).head().getDouble(4) == 9.0)
      // out-of-band feed-captured churn (a GDPR delete by another job):
      // the next batch's replication picks it up — mirrors the TABLE
      MedallionTable(spark, src).deleteVectored($"event_id" === 2L)
      input.addData(ev(4, 5, 2, "v", 4.0))
      q.processAllAvailable()
      mirrorEq()
      assert(MedallionTable(spark, mir).read
        .filter($"event_id" === 2L).count() == 0, "out-of-band delete mirrored")
    } finally q.stop()
  }

  test("graft-cdf streaming source: per-commit change rows, exactly-once " +
      "across checkpoint restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.table.MedallionTable
    val p = tmpDir("cdfsrc")
    val ck = tmpDir("cdfsrc_ck")
    val t = MedallionTable(spark, p)
    t.overwrite((0L until 10L).map(i => (i, s"s$i")).toDF("id", "s"))
    t.enableChangeDataFeed()
    // pre-stream churn: the first batch starts at the enablement commit
    t.append(Seq((100L, "a")).toDF("id", "s"))
    val out = tmpDir("cdfsrc_out")
    def startQ() =
      spark.readStream.format("graft-cdf").option("path", p).load()
        .drop("_commit_timestamp")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
    def got() = spark.read.parquet(out)
      .select("id", "s", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted
    val q = startQ()
    try {
      q.processAllAvailable()
      assert(got() == Seq((100L, "a", "insert", 3L)))
      // live churn: DV update arrives as pre+post images
      t.updateVectored($"id" === 100L, Map("s" -> lit("a2")))
      q.processAllAvailable()
      assert(got() == Seq(
        (100L, "a", "insert", 3L),
        (100L, "a", "update_preimage", 4L),
        (100L, "a2", "update_postimage", 4L)).sorted)
    } finally q.stop()
    // churn while the stream is DOWN, then restart from the checkpoint:
    // exactly the unseen commits are appended (offsets are commit
    // ordinals; nothing re-delivers, nothing is missed)
    t.deleteVectored($"id" === 100L)
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(got() == Seq(
        (100L, "a", "insert", 3L),
        (100L, "a", "update_preimage", 4L),
        (100L, "a2", "update_postimage", 4L),
        (100L, "a2", "delete", 5L)).sorted,
        s"restart must deliver exactly the unseen commits: ${got()}")
    } finally q2.stop()
  }

  test("graft-cdf startingVersion skips earlier commits (Delta parity)") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdfsv")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    t.append(Seq((1L, "skipped")).toDF("id", "s"))
    t.append(Seq((2L, "skipped")).toDF("id", "s"))
    val from = t.commitVersion + 1
    t.append(Seq((3L, "kept")).toDF("id", "s"))
    t.append(Seq((4L, "kept")).toDF("id", "s"))
    val out = tmpDir("cdfsv_out")
    val q = spark.readStream.format("graft-cdf").option("path", p)
      .option("startingVersion", from.toString).load()
      .drop("_commit_timestamp")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("cdfsv_ck")).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq
      .sorted == Seq(3L, 4L),
      "only commits >= startingVersion are delivered")
  }

  test("retention composes with the stream: an expired backlog refuses " +
      "the restart with the hatch; fresh checkpoint + startingVersion " +
      "re-baselines onto the surviving window") {
    import spark.implicits._
    import graft.table.{ChangeFeed, MedallionTable}
    val p = tmpDir("cdfexp")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    val out = tmpDir("cdfexp_out")
    val ck = tmpDir("cdfexp_ck")
    def startQ(ckDir: String, outDir: String = out,
        opts: Map[String, String] = Map.empty) = {
      val r = spark.readStream.format("graft-cdf").option("path", p)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load().drop("_commit_timestamp")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckDir).start()
    }
    t.append(Seq((1L, "a")).toDF("id", "s"))
    val q = startQ(ck)
    try q.processAllAvailable() finally q.stop()
    // the stream goes down; 20 commits land; retention expires most
    (0 until 20).foreach(i =>
      t.append(Seq((100L + i, "b")).toDF("id", "s")))
    val expired = t.expireChangeFeed(keepCommits = 5)
    // restart from the old checkpoint: its next range reaches into the
    // expired commits — fail-stop with the hatch, never silent loss
    val q2 = startQ(ck)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(e.getMessage.contains("retention") ||
      Option(e.getCause).exists(_.getMessage.contains("retention")),
      s"expired-backlog restart must name the retention hatch: $e")
    // re-baseline: fresh checkpoint + fresh sink dir (a parquet sink's
    // _spark_metadata is per-query — reusing the dir would skip batches)
    // + startingVersion at the watermark edge drains exactly the
    // surviving window
    val out2 = tmpDir("cdfexp_out2")
    val q3 = startQ(tmpDir("cdfexp_ck2"), out2,
      Map("startingVersion" -> (expired + 1).toString))
    try q3.processAllAvailable() finally q3.stop()
    val gotIds = spark.read.parquet(out2).select("id").as[Long]
      .collect().toSeq.sorted
    assert(gotIds == Seq(115L, 116L, 117L, 118L, 119L),
      s"exactly the surviving 5 commits' rows, once each: $gotIds")
  }

  test("graft-cdf startingTimestamp resolves to the first commit at or " +
      "after the instant") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdfst")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    t.append(Seq((1L, "old")).toDF("id", "s"))
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    t.append(Seq((2L, "new")).toDF("id", "s"))
    val out = tmpDir("cdfst_out")
    val q = spark.readStream.format("graft-cdf").option("path", p)
      .option("startingTimestamp", cut.toString).load()
      .drop("_commit_timestamp")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("cdfst_ck")).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq ==
      Seq(2L), "only commits at/after the instant are delivered")
    // mutually exclusive with startingVersion
    intercept[Exception] {
      val q2 = spark.readStream.format("graft-cdf").option("path", p)
        .option("startingTimestamp", cut.toString)
        .option("startingVersion", "1").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("cdfst_ck2")).start()
      try q2.processAllAvailable() finally q2.stop()
    }
  }

  test("graft-cdf startingTimestamp resolves past marker retention: an " +
      "instant deeper than HistoryDepth commits still delivers from the " +
      "right captured commit") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdfstdeep")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    t.append(Seq((1L, "old")).toDF("id", "s"))
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    // 12 commits at/after the instant — more than HistoryDepth (8), so
    // only the newest 8 markers survive; the manifests all do. A
    // marker-history resolution would silently clamp to the oldest
    // surviving marker and lose the first ~4 commits (round-14 advice).
    val n = 12
    (0 until n).foreach(i =>
      t.append(Seq((100L + i, s"n$i")).toDF("id", "s")))
    val out = tmpDir("cdfstdeep_out")
    val q = spark.readStream.format("graft-cdf").option("path", p)
      .option("startingTimestamp", cut.toString).load()
      .drop("_commit_timestamp")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("cdfstdeep_ck")).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq
      .sorted == (0 until n).map(100L + _).sorted,
      "every captured commit at/after the instant delivers, even past " +
        "marker retention")
  }

  test("graft-cdf startingTimestamp predating expired captures refuses " +
      "fail-stop instead of silently starting late") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdfstexp")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    (0 until 10).foreach(i =>
      t.append(Seq((100L + i, "b")).toDF("id", "s")))
    t.expireChangeFeed(keepCommits = 3)
    // the instant predates the oldest SURVIVING manifest and older
    // captures were expired: the true first-at-or-after commit may be
    // gone — must refuse, not clamp
    val q = spark.readStream.format("graft-cdf").option("path", p)
      .option("startingTimestamp", cut.toString).load()
      .writeStream.format("noop")
      .option("checkpointLocation", tmpDir("cdfstexp_ck")).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("startingVersion") || msg.contains("re-baseline"),
      s"refusal must name the hatch: $e")
  }

  test("graft-cdf rate-limit floor survives a crash window: one intact " +
      "slot always holds the previous reported offset") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdffloor")
    val ck = tmpDir("cdffloor_ck")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    // 6 commits drained at maxCommitsPerTrigger=2 → >=3 batches, so the
    // floor is persisted several times and BOTH slots are populated; the
    // clamp binds on restart (en + 2 is far below the WAL's offset), so
    // a lost floor would report below the checkpoint and re-deliver
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "s")))
    val out = tmpDir("cdffloor_out")
    def startQ() =
      spark.readStream.format("graft-cdf").option("path", p)
        .option("maxCommitsPerTrigger", "2").load()
        .drop("_commit_timestamp")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
    val q = startQ()
    try q.processAllAvailable() finally q.stop()
    def got() = spark.read.parquet(out).select("id").as[Long]
      .collect().toSeq.sorted
    assert(got() == (1L to 6L).toSeq)
    // simulate the delete-then-rename crash window on the NEWER slot:
    // with two alternating slots, the other still holds a floor ≥ the
    // WAL's committed offset, so a restart re-delivers nothing
    val fs = new org.apache.hadoop.fs.Path(ck)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sources = new org.apache.hadoop.fs.Path(ck, "sources/0")
    val slot0 = new org.apache.hadoop.fs.Path(sources, "graft-cdf-reported")
    val slot1 = new org.apache.hadoop.fs.Path(sources, "graft-cdf-reported.1")
    assert(fs.exists(slot0) || fs.exists(slot1), "a floor slot must exist")
    def slotVal(sp: org.apache.hadoop.fs.Path): Long =
      if (!fs.exists(sp)) Long.MinValue
      else {
        val in = fs.open(sp)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      }
    assert(fs.exists(slot0) && fs.exists(slot1),
      "repeated persists must populate BOTH alternating slots")
    val newer = if (slotVal(slot0) >= slotVal(slot1)) slot0 else slot1
    fs.delete(newer, false) // the crash window: newest write vanished
    t.append(Seq((7L, "c")).toDF("id", "s"))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(got() == (1L to 7L).toSeq,
      s"restart inside the floor crash window must not re-deliver: ${got()}")
  }

  test("graft-cdf maxCommitsPerTrigger bounds catch-up: 100+ commits " +
      "landed while down drain across >=3 batches, exactly-once") {
    import spark.implicits._
    import graft.table.MedallionTable
    val p = tmpDir("cdfrate")
    val ck = tmpDir("cdfrate_ck")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq((0L, "z")).toDF("id", "s"))
    t.enableChangeDataFeed()
    // 102 commits while no stream is running — the week-long-outage shape
    val n = 102
    (0 until n).foreach(i =>
      t.append(Seq((1000L + i, s"b$i")).toDF("id", "s")))
    val out = tmpDir("cdfrate_out")
    def startQ() =
      spark.readStream.format("graft-cdf").option("path", p)
        .option("maxCommitsPerTrigger", "40").load()
        .drop("_commit_timestamp")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
    val q = startQ()
    val drained =
      try {
        q.processAllAvailable()
        q.recentProgress.count(_.numInputRows > 0)
      } finally q.stop()
    assert(drained >= 3,
      s"102-commit backlog at maxCommitsPerTrigger=40 must drain across " +
        s">=3 batches, got $drained")
    def got() = spark.read.parquet(out).select("id").as[Long]
      .collect().toSeq.sorted
    assert(got() == (0 until n).map(1000L + _).sorted,
      "each backlog commit delivered exactly once")
    // restart: the persisted floor keeps the clamp monotone — no
    // re-delivery, and a fresh commit still arrives
    t.append(Seq((5000L, "tail")).toDF("id", "s"))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(got() == ((0 until n).map(1000L + _) :+ 5000L).sorted,
      "restart must deliver exactly the unseen commit, nothing twice")
  }

  test("streaming dedup suppresses in-watermark duplicates, state evicts after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupedEvents(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 10, 1, "c", 1.0), ev(1, 11, 1, "c", 1.0), ev(2, 12, 1, "c", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
        "in-batch duplicate must be suppressed")
      input.addData(ev(1, 15, 1, "c", 1.0)) // still within watermark: dropped
      q.processAllAvailable()
      assert(spark.table("dedup_stream").filter("event_id = 1").count() == 1)
      // push the watermark far past eviction, then replay id 1: passes
      input.addData(ev(9, 500, 9, "c", 0.1))
      q.processAllAvailable()
      input.addData(ev(1, 510, 1, "c", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").filter("event_id = 1").count() == 2,
        "post-eviction re-arrival passes (bounded-state contract)")
    } finally q.stop()
  }

  test("gap-based sessionization closes sessions on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = userSessions(input.toDS(), gapMinutes = 30, watermark = "0 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 60,70 (one session); user 2: event at 65
      input.addData(ev(1, 60, 1, "c", 1.0), ev(2, 70, 1, "c", 2.0), ev(3, 65, 2, "v", 5.0))
      q.processAllAvailable()
      // advance event time far past both gaps → both sessions time out
      input.addData(ev(4, 240, 3, "c", 0.5))
      q.processAllAvailable()
      input.addData(ev(5, 400, 3, "c", 0.5)) // push watermark again to flush
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"user1 session missing: $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"user2 session missing: $rows")
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = userSessionsTws(input.toDS(), gapMinutes = 30, watermark = "0 minutes")
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 60,70 (one session); user 2: event at 65
      input.addData(ev(1, 60, 1, "c", 1.0), ev(2, 70, 1, "c", 2.0), ev(3, 65, 2, "v", 5.0))
      q.processAllAvailable()
      // advance event time far past both gaps → both sessions time out
      input.addData(ev(4, 240, 3, "c", 0.5))
      q.processAllAvailable()
      input.addData(ev(5, 400, 3, "c", 0.5)) // push watermark again to flush
      q.processAllAvailable()
      val rows = spark.table("sessions_tws").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"user1 session missing: $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"user2 session missing: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("late in-watermark event below session start merges and lowers `started`") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = userSessions(input.toDS(), gapMinutes = 30, watermark = "120 minutes")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 60, 1, "c", 1.0))
      q.processAllAvailable()
      // t=45 is within the 120-min watermark and within gap of the session
      // extent: must merge and LOWER started to 45. t=10 is older than
      // start-gap: must close as its own singleton, not pollute the session.
      input.addData(ev(2, 45, 1, "c", 2.0), ev(3, 10, 1, "c", 7.0))
      q.processAllAvailable()
      input.addData(ev(4, 500, 9, "c", 0.1), ev(5, 900, 9, "c", 0.1)) // flush
      q.processAllAvailable()
      val rows = spark.table("sessions_late").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getTimestamp(3).getTime / 60000)).toSet
      assert(rows.contains((1L, 1L, 7.0, 10L)), s"late orphan singleton missing: $rows")
      assert(rows.contains((1L, 2L, 3.0, 45L)),
        s"merged session must start at the late event (45): $rows")
    } finally q.stop()
  }

  test("two late orphans within the gap merge into ONE session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = userSessions(input.toDS(), gapMinutes = 30, watermark = "120 minutes")
      .writeStream.format("memory").queryName("sessions_orphans")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 60, 1, "c", 1.0))
      q.processAllAvailable()
      // Two late orphans in SEPARATE micro-batches, 15 min apart (≤ gap):
      // the round-5 sessionizer emitted each as its own singleton; they are
      // one session [10, 25] by the gap contract.
      input.addData(ev(2, 10, 1, "c", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, 25, 1, "c", 3.0))
      q.processAllAvailable()
      input.addData(ev(4, 500, 9, "c", 0.1), ev(5, 900, 9, "c", 0.1)) // flush
      q.processAllAvailable()
      val rows = spark.table("sessions_orphans").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getTimestamp(3).getTime / 60000, r.getTimestamp(4).getTime / 60000)).toSet
      assert(rows.contains((1L, 2L, 5.0, 10L, 25L)),
        s"late orphans must merge into one [10,25] session: $rows")
      assert(rows.contains((1L, 1L, 1.0, 60L, 60L)), s"main session missing: $rows")
    } finally q.stop()
  }

  test("a late event bridging two buffered sessions merges them (fMGWS + TWS)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def drive(name: String,
        mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[SessionSummary]) = {
      val input = MemoryStream[Event]
      val q = mk(input.toDS()).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(ev(1, 100, 1, "c", 1.0)) // session A [100]
        q.processAllAvailable()
        input.addData(ev(2, 30, 1, "c", 2.0))  // orphan session B [30] (> gap below A)
        q.processAllAvailable()
        input.addData(ev(3, 65, 1, "c", 4.0))  // within gap of BOTH (30+40≥65, 100-40≤65)
        q.processAllAvailable()
        input.addData(ev(4, 600, 9, "c", 0.1), ev(5, 990, 9, "c", 0.1)) // flush
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getTimestamp(3).getTime / 60000, r.getTimestamp(4).getTime / 60000)).toSet
      } finally q.stop()
    }
    try {
      val fm = drive("sessions_bridge_fm",
        ds => userSessions(ds, gapMinutes = 40, watermark = "120 minutes"))
      val tws = drive("sessions_bridge_tws",
        ds => userSessionsTws(ds, gapMinutes = 40, watermark = "120 minutes"))
      // gap=40: A=[100], B=[30]; 65 is within 40 of both extents → one
      // session [30,100] with all 3 events.
      for ((rows, api) <- Seq((fm, "fMGWS"), (tws, "TWS"))) {
        assert(rows.exists(r => r._1 == 1L && r._2 == 3L && r._3 == 7.0 &&
          r._4 == 30L && r._5 == 100L),
          s"$api: bridged session [30,100] n=3 missing: $rows")
        assert(!rows.exists(r => r._1 == 1L && r._2 < 3L),
          s"$api: partial sessions leaked past the merge: $rows")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionizer flushes complete sessions on a BATCH frame (flushAtEnd)") {
    import spark.implicits._
    // Out-of-order batch input: sessions must still merge by gap, with all
    // sessions emitted at end-of-group (batch mode has no timeouts).
    val evs = Seq(ev(3, 90, 1, "c", 4.0), ev(1, 10, 1, "c", 1.0),
      ev(4, 50, 2, "c", 8.0), ev(2, 25, 1, "c", 2.0)).toDS()
    val got = userSessions(evs, gapMinutes = 30).collect()
      .map(s => (s.user_id, s.n_events, s.total_value,
        s.started.getTime / 60000, s.ended.getTime / 60000)).toSet
    assert(got == Set((1L, 2L, 3.0, 10L, 25L), (1L, 1L, 4.0, 90L, 90L),
      (2L, 1L, 8.0, 50L, 50L)))
  }

  test("streaming upsert sink merges micro-batches idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val table = tmpDir("stream_upsert")
    val ckpt = tmpDir("stream_ckpt")
    val q = EventStreams.upsertStream(input.toDF(), table, Seq("event_id"), ckpt)
    try {
      input.addData(ev(1, 60, 1, "c", 1.0), ev(2, 61, 1, "c", 2.0))
      q.processAllAvailable()
      // batch 2 updates event 2 and adds event 3
      input.addData(ev(2, 61, 1, "c", 20.0), ev(3, 62, 2, "v", 3.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(table)
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
    } finally q.stop()
  }

  test("DV streaming upsert sink: O(batch) merges, zero base files rewritten") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val table = tmpDir("stream_udv")
    val q = EventStreams.upsertStreamVectored(input.toDF(), table,
      Seq("event_id"), tmpDir("stream_udv_ckpt"))
    def baseFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(table))
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getPath.contains("_graft_meta"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    try {
      input.addData(ev(1, 60, 1, "c", 1.0), ev(2, 61, 1, "c", 2.0))
      q.processAllAvailable()
      val before = baseFiles()
      // batch 2: update event 2, insert event 3 — WITH an in-batch
      // duplicate of the new key (the sink dedups before the merge)
      input.addData(ev(2, 61, 1, "c", 20.0), ev(3, 62, 2, "v", 3.0),
        ev(3, 62, 2, "v", 3.0))
      q.processAllAvailable()
      assert(baseFiles() == before,
        "the DV sink amends via marks + staged batch, never a rewrite")
      assert(graft.table.DvUpdates.committedBatches(spark, table).nonEmpty)
      val rows = graft.table.MedallionTable(spark, table).read
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows == Map(1L -> 1.0, 2L -> 20.0, 3L -> 3.0))
    } finally q.stop()
  }

  test("streaming materialized join view tracks fact upserts exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dimPath = tmpDir("sjoin_dim")
    graft.table.MedallionTable(spark, dimPath).overwrite(
      Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name"))
    val factPath = tmpDir("sjoin_fact")
    val viewPath = tmpDir("sjoin_view")
    val q = EventStreams.joinStream(input.toDF(), factPath, dimPath, viewPath,
      keys = Seq("event_id"), on = Seq("user_id" -> "user_id"),
      checkpoint = tmpDir("sjoin_ckpt"))
    try {
      input.addData(ev(1, 60, 1, "c", 1.0), ev(2, 61, 9, "c", 2.0)) // 9 dangles
      q.processAllAvailable()
      input.addData(ev(2, 61, 2, "c", 20.0), ev(3, 62, 1, "v", 3.0))
      q.processAllAvailable()
      val mv = graft.table.MedallionTable(spark, viewPath).read
        .select("event_id", "name", "value").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      // event 2's first image dangled (user 9) and never materialized;
      // its update re-keyed it onto bob and it appeared with new values
      assert(mv == Map(1L -> (("alice", 1.0)), 2L -> (("bob", 20.0)),
        3L -> (("alice", 3.0))))
    } finally q.stop()
  }

  test("streaming ANN ingest maintains the standing index exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    def vec(id: Long, axis: Int) =
      (id, Seq.tabulate(16)(d => if (d == axis) 10.0f else 0.1f))
    val idxPath = tmpDir("sann_idx")
    val idx = new graft.similarity.StandingAnnIndex(spark, idxPath)
    idx.train((0 until 40).map(i => vec(i, i % 4)).toDF("vec_id", "embedding"),
      nCentroids = 4, iterations = 1)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.annIngestStream(
      input.toDF().toDF("vec_id", "embedding"), idxPath, tmpDir("sann_ckpt"))
    try {
      // streamed vectors live on axes the bootstrap (axes 0-3) never used,
      // so the axis-7 probe's unique nearest neighbor is the streamed one
      // (an identical vector assigns to the same argmax cell as the probe)
      input.addData(vec(100L, 5), vec(101L, 6))
      q.processAllAvailable()
      input.addData(vec(200L, 7))
      q.processAllAvailable()
      val byTag = idx.vectorTable.read.groupBy("batch_tag").count().collect()
        .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
      assert(byTag == Map(0L -> 40L, 1L -> 2L, 2L -> 1L), s"tags: $byTag")
      // a replayed micro-batch (same tag) is skipped — exactly-once index
      idx.ingest(Seq(vec(100L, 5), vec(101L, 6)).toDF("vec_id", "embedding"),
        tag = 1L)
      assert(idx.vectorTable.read.count() == 43)
      // the streamed vectors are queryable through the standing index
      val top = idx.query(Seq(vec(999L, 7)).toDF("vec_id", "embedding"),
        k = 1, nProbe = 1).collect()
      assert(top.length == 1 && top(0).getLong(1) == 200L,
        s"nearest to a streamed axis-2 probe must be the streamed 200L: ${top.toSeq}")
    } finally q.stop()
  }

  test("streaming BM25 ingest maintains the standing index exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idxPath = tmpDir("sbm25_idx")
    val idx = new graft.text.StandingBm25Index(spark, idxPath)
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.bm25IngestStream(
      input.toDF().toDF("doc_id", "text"), idxPath, tmpDir("sbm25_ckpt"))
    try {
      input.addData(1L -> "spark merge window spark", 2L -> "merge quick fox")
      q.processAllAvailable()
      input.addData(3L -> "window spark lazy dog")
      q.processAllAvailable()
      def scores() = idx.query(Seq("spark", "merge", "window"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val streamed = scores()
      assert(streamed.map(_._1).toSet == Set(1L, 2L, 3L))
      // a replayed micro-batch (same tag) must not double tf/df —
      // counts-sensitive exactly-once, not just membership idempotence
      idx.ingest(Seq(1L -> "spark merge window spark",
        2L -> "merge quick fox").toDF("doc_id", "text"), tag = 1L)
      assert(scores() == streamed, "replayed micro-batch changed BM25 scores")
      // the streamed index equals a batch-built index over the same docs
      val batch = new graft.text.StandingBm25Index(spark, tmpDir("sbm25_batch"))
      batch.ingest(Seq(1L -> "spark merge window spark", 2L -> "merge quick fox",
        3L -> "window spark lazy dog").toDF("doc_id", "text"), tag = 1L)
      assert(scores() == batch.query(Seq("spark", "merge", "window"), k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
        "streamed index diverges from a batch build over the same corpus")
    } finally q.stop()
  }

  test("streaming curation funnel: quality gate + dedup + exactly-once curated table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String)]
    val idxPath = tmpDir("scurate_idx")
    val curated = tmpDir("scurate_out")
    val ckpt = tmpDir("scurate_ckpt")
    val oneBand = (d: org.apache.spark.sql.DataFrame) =>
      d.where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))
    val quality = size(split(col("text"), "\\s+")) >= 3 // toy gopher gate
    // standing benchmark index: an 8-gram canary any contaminated doc shares
    val decontPath = tmpDir("scurate_decont")
    val canary = "one two three four five six seven eight"
    new graft.text.DecontaminationIndex(spark, decontPath)
      .ingest(Seq(500L -> s"eval item: $canary").toDF("doc_id", "text"), tag = 1L)
    val q = EventStreams.curateStream(
      input.toDF().toDF("doc_id", "text"), idxPath, curated, oneBand,
      quality, ckpt, decontIndexPath = Some(decontPath))
    try {
      input.addData(1L -> "alpha beta gamma", 2L -> "too short")
      q.processAllAvailable()
      // batch 2: a dup of a curated batch-1 doc, a fresh doc, a reject,
      // and a benchmark-contaminated doc
      input.addData(10L -> "alpha beta gamma", 11L -> "epsilon zeta eta",
        12L -> "nope", 13L -> s"leaked benchmark text $canary here")
      q.processAllAvailable()
      def curatedIds() = spark.read.parquet(curated)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(curatedIds() == Set(1L, 11L),
        s"curated must hold quality-passing non-dups, got ${curatedIds()}")
      // replay micro-batch id 1 = the SECOND batch (ingested, crashed
      // before checkpoint commit): decisions reproduce via the
      // tag-excluded re-check, the curated partition overwrites itself —
      // table contents unchanged
      EventStreams.curateBatch(
        Seq(10L -> "alpha beta gamma", 11L -> "epsilon zeta eta",
          12L -> "nope", 13L -> s"leaked benchmark text $canary here")
          .toDF("doc_id", "text"),
        1L, idxPath, curated, oneBand, quality, Some(decontPath))
      assert(curatedIds() == Set(1L, 11L),
        "replayed batch must leave the curated table unchanged")
      // rejected docs never reach the index: only 1, 10, 11 were ingested
      val idx = new graft.dedup.StandingDedupIndex(spark, idxPath, oneBand)
      assert(idx.indexTable.read
        .filter(org.apache.spark.sql.functions.col("h").isNotNull)
        .select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 10L, 11L),
        "index must hold exactly the quality-passing docs")
    } finally q.stop()
  }

  test("streaming dedup checks each micro-batch against the index before ingesting it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String)]
    val idxPath = tmpDir("sdedup_idx")
    val report = tmpDir("sdedup_report")
    val ckpt = tmpDir("sdedup_ckpt")
    // same trivial band builder as StandingDedupIndexSpec: equal text ⇒
    // shared band, so both decision columns are exercised
    val oneBand = (d: org.apache.spark.sql.DataFrame) =>
      d.where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))
    val q = EventStreams.dedupStream(
      input.toDF().toDF("doc_id", "text"), idxPath, report, oneBand, ckpt)
    try {
      input.addData(1L -> "alpha beta", 2L -> "gamma delta")
      q.processAllAvailable()
      // batch 2: one dup of batch 1, one fresh doc
      input.addData(10L -> "alpha beta", 11L -> "epsilon zeta")
      q.processAllAvailable()
      val rows = spark.read.parquet(report).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(rows(1L) == ((false, 0L)) && rows(2L) == ((false, 0L)),
        "batch 1 must see an empty index — and never count itself")
      assert(rows(10L) == ((true, 1L)),
        "batch 2's dup must hit batch 1's indexed hash and band")
      assert(rows(11L) == ((false, 0L)), "fresh doc must pass clean")
      // the index accumulated both batches
      val idx = new graft.dedup.StandingDedupIndex(spark, idxPath, oneBand)
      assert(idx.indexTable.read
        .filter(org.apache.spark.sql.functions.col("h").isNotNull)
        .count() == 4)
      // simulate a replay of micro-batch 1 (ingested, then crashed before
      // the checkpoint commit): tag-excluded re-check + partition
      // overwrite must leave the report byte-identical in content
      val b1 = Seq(10L -> "alpha beta", 11L -> "epsilon zeta")
        .toDF("doc_id", "text")
      idx.check(b1, excludeTag = Some(1L))
        .withColumn("ingest_batch_id", lit(1L))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch_id").parquet(report)
      idx.ingest(b1, tag = 1L)
      val replayed = spark.read.parquet(report).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      assert(replayed == rows, "batch replay must be idempotent on the report")
    } finally q.stop()
  }

  test("file-source ingest processes each landed file exactly once across runs") {
    import spark.implicits._
    val src = tmpDir("ingest_src")
    val table = tmpDir("ingest_table")
    val ckpt = tmpDir("ingest_ckpt")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING")

    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.option("header", true).csv(s"$src/batch1")
    val q1 = EventStreams.fileIngest(spark, src, schema, "csv",
      Map("header" -> "true", "recursiveFileLookup" -> "true"),
      table, Nil, ckpt)
    q1.awaitTermination() // AvailableNow drains and stops
    assert(spark.read.parquet(table).count() == 2)

    // second landing + restart: only the new file is processed
    Seq((3L, "c")).toDF("id", "name")
      .write.option("header", true).csv(s"$src/batch2")
    val q2 = EventStreams.fileIngest(spark, src, schema, "csv",
      Map("header" -> "true", "recursiveFileLookup" -> "true"),
      table, Nil, ckpt)
    q2.awaitTermination()
    def rows() = spark.read.parquet(table).select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows() == Set((1L, "a"), (2L, "b"), (3L, "c")),
      "restart must not reprocess batch1 files")

    // replayed batch (crash-between-write-and-commit analog): re-running a
    // batch id overwrites its own ingest_batch_id partition — no duplicates
    val replay = spark.read.parquet(table).where("ingest_batch_id = 1")
      .select("id", "name")
    replay.withColumn("ingest_batch_id", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch_id").parquet(table)
    assert(rows() == Set((1L, "a"), (2L, "b"), (3L, "c")),
      "batch replay must be idempotent")
  }

  test("stream-stream interval join pairs clicks with in-window views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = clicksWithRecentViews(input.toDF(), watermark = "0 minutes",
      windowMinutes = 30)
      .writeStream.format("memory").queryName("cwv")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        ev(1, 10, 1, "view", 0.0),   // in window of click@30 (20 min before)
        ev(2, 29, 1, "view", 0.0),   // in window
        ev(3, 31, 1, "view", 0.0),   // AFTER the click — excluded
        ev(4, 25, 2, "view", 0.0),   // other user — excluded
        ev(5, 30, 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(ev(6, 200, 9, "click", 0.0)) // advance watermark to flush
      q.processAllAvailable()
      val pairs = spark.table("cwv").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(pairs == Set((5L, 1L), (5L, 2L)), s"got $pairs")
    } finally q.stop()
  }

  test("stream-static dim enrichment joins every micro-batch against the dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid", "tier")
    val input = MemoryStream[Event]
    val q = EventStreams.enrichWithDim(input.toDF(), dim, "user_id", "uid")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 1, 1, "c", 1.0), ev(2, 2, 2, "c", 1.0), ev(3, 3, 7, "c", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally q.stop()
  }

  test("tableTail streams a table's append tail exactly once") {
    import spark.implicits._
    val p = tmpDir("tail_tbl")
    val t = new graft.table.MedallionTable(spark, p)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val q = tableTail(spark, p, t.read.schema)
      .writeStream.format("memory").queryName("tail_rows")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_rows").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L), "initial snapshot streams through")
      t.append(Seq((3L, "c")).toDF("id", "s"))
      q.processAllAvailable()
      // the append arrives, and earlier rows are NOT re-emitted
      assert(spark.table("tail_rows").collect().map(_.getLong(0)).toSeq.sorted ==
        Seq(1L, 2L, 3L), "append tail arrives exactly once")
      t.append(Seq((4L, "d"), (5L, "e")).toDF("id", "s"))
      q.processAllAvailable()
      assert(spark.table("tail_rows").count() == 5)
    } finally q.stop()
  }

  test("windowed counts transform also runs on the batch events table") {
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = windowedCounts(batch)
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "total_value"))
  }

  test("idempotent append sink: micro-batches land once; a replayed batch id is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.table.MedallionTable(spark, tmpDir("idem_sink_tbl"))
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.idempotentAppendStream(
      input.toDF().toDF("id", "s"), t, "evt", tmpDir("idem_sink_ckpt"))
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(t.read.count() == 3L)
      // an at-least-once redelivery of the LAST epoch (what a restart
      // mid-commit replays) must not double its rows
      assert(!t.appendIdempotent(Seq((3L, "c")).toDF("id", "s"), "evt", 1L))
      assert(t.read.count() == 3L)
      assert(t.lastTxnVersion("evt").contains(1L))
    } finally q.stop()
  }
}
