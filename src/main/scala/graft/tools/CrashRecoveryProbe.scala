package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.MedallionTable

/** CROSS-PROCESS crash-kill recovery probe (round 18): the single-JVM
  * failpoint specs prove the staged-append crash windows in-process, but
  * the deployment shape is a separate writer PROCESS dying — `kill -9`,
  * OOM-killer, preemption — leaving its litter for a janitor plus the
  * next writer to recover from. This probe spawns a real child JVM whose
  * staged append HALTS (`Runtime.halt` via `GRAFT_FAILPOINT_HALT` —
  * no shutdown hooks, no finally blocks) at each window:
  *
  *   - `post-stage-write`   — staging written, NO lock/claim yet
  *   - `mid-claim-first`    — scoped lock + claimed marker held, nothing
  *                            published
  *   - `mid-append-publish` — TORN: first file renamed in, rest staged
  *
  * then drives recovery (default-config vacuum must SKIP the young
  * litter; operator-mode `vacuumAssumeNoWriters` reaps it) and the next
  * writer, asserting the serial model: child rows land exactly-once or
  * not at all (the torn window keeps its documented prefix — never a
  * duplicate), the next append always succeeds, and no litter survives
  * operator recovery.
  *
  * Usage: runMain graft.tools.CrashRecoveryProbe
  *        (child mode, internal: --child <tablePath>)
  */
object CrashRecoveryProbe {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--child")) {
      val spark = session()
      import spark.implicits._
      // batch spans TWO partitions → two publish renames → the torn
      // window between them exists
      MedallionTable(spark, args(1), Seq("blk"))
        .append((0 until 1000).map(i => (i.toLong, i % 2)).toDF("id", "blk"))
      spark.stop()
      sys.exit(0) // only reached when no halt env is set
    }

    val spark = session()
    import spark.implicits._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val addOpens = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.toArray.map(_.toString)
      .toSeq.sliding(2).collect {
        case Seq("--add-opens", v) => Seq("--add-opens", v)
      }.flatten.toSeq

    for (window <- Seq("post-stage-write", "mid-claim-first",
        "mid-append-publish")) {
      val path = java.nio.file.Files.createTempDirectory(
        s"crashprobe_${window.replace('-', '_')}").toString + "/t"
      val t = MedallionTable(spark, path, Seq("blk"))
      t.overwrite(Seq((-1L, 0), (-2L, 1)).toDF("id", "blk"))

      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g",
        "-Dspark.ui.enabled=false", "-cp",
        System.getProperty("java.class.path"),
        "graft.tools.CrashRecoveryProbe", "--child", path)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.environment().put("GRAFT_FAILPOINT_HALT", window)
      val child = pb.start()
      require(child.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        s"$window: child did not exit")
      val rc = child.exitValue()
      require(rc == 137, s"$window: child exited $rc, expected halt(137)")

      def childRows() = t.read.filter($"id" >= 0).count()
      val visible = childRows()
      val commits = new java.io.File(s"${path}__graft_commits")
      def names() = commits.listFiles().map(_.getName).toSeq
      val stagingLeft = names().exists(_.startsWith("append_staging_"))
      window match {
        case "post-stage-write" | "mid-claim-first" =>
          require(visible == 0,
            s"$window: unpublished rows visible: $visible")
          require(stagingLeft, s"$window: expected staging litter")
        case "mid-append-publish" =>
          require(visible > 0 && visible < 1000,
            s"$window: expected a torn prefix, got $visible")
      }

      // a DEFAULT-config janitor vacuum must skip the minutes-old litter
      // (it cannot know the writer is dead — that is the retention
      // horizon's whole point)…
      t.vacuum()
      require(names().exists(_.startsWith("append_staging_")) == stagingLeft,
        s"$window: default vacuum reaped young staging")
      // …the operator who watched the kill reaps it now
      spark.conf.set("spark.graft.vacuumAssumeNoWriters", "true")
      try t.vacuum()
      finally spark.conf.unset("spark.graft.vacuumAssumeNoWriters")
      require(!names().exists(n => n.startsWith("append_staging_") ||
          n == "write.lock" ||
          (n.startsWith("write_") && n.endsWith(".lock"))),
        s"$window: litter survives operator vacuum: ${names().mkString(",")}")

      // the next writer proceeds; serial model = seed + torn prefix +
      // this append, every id exactly once
      t.append((0 until 500).map(i => (10_000L + i, i % 2)).toDF("id", "blk"))
      val ids = t.read.select("id").collect().map(_.getLong(0))
      require(ids.length == ids.distinct.length,
        s"$window: duplicate ids after recovery")
      require(ids.count(_ >= 10_000L) == 500,
        s"$window: recovery append lost rows")
      require(childRows() == visible + 500,
        s"$window: torn prefix changed during recovery")
      require(t.fullHistory().nonEmpty, s"$window: history unreadable")
      println(s"crash window $window OK: torn=${visible} child rows, " +
        "recovery append landed, no duplicates, no litter")
    }
    spark.stop()
  }
}
