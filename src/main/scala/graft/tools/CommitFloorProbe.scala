package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import graft.table.MedallionTable

/** Profile the per-commit protocol floor (the ~0.45 s fixed cost that
  * dominates micro-batch workloads — ClusterProbe/ProfileCurate's named
  * residual): drives N tiny appends on three table shapes and prints the
  * mean per-phase nanos from [[MedallionTable.commitPhaseHook]] plus a
  * Spark-job census — attributing the floor to lock/claim fs ops, the
  * write job, the file-set walks, stats maintenance, CDF capture, and
  * journal upkeep.
  *
  * Usage: runMain graft.tools.CommitFloorProbe [iterations]
  */
object CommitFloorProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val sites = scala.collection.concurrent.TrieMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          j.stageInfos.lastOption.map(si => si.name + " @ " +
            si.details.linesIterator
              .filter(l => l.contains("graft.") && !l.contains("graft.tools"))
              .take(1).mkString).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          jobs.incrementAndGet()
          val ms = System.currentTimeMillis() - t0
          jobMs.addAndGet(ms)
          val (n, tot) = sites.getOrElse(site, (0, 0L))
          sites(site) = (n + 1, tot + ms)
        }
    })

    def scenario(tag: String, cdf: Boolean, stats: Boolean,
        serial: Boolean): Unit = {
      spark.conf.set("spark.graft.serialAppends", serial.toString)
      val p = java.nio.file.Files.createTempDirectory(s"cfp_$tag")
        .toString + "/t"
      val t = MedallionTable(spark, p)
      t.overwrite((0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
      if (cdf) t.enableChangeDataFeed()
      if (stats) t.refreshStats()
      val acc = scala.collection.mutable.LinkedHashMap[String, (Int, Long)]()
      MedallionTable.commitPhaseHook = (name, nanos) => acc.synchronized {
        val (n, tot) = acc.getOrElse(name, (0, 0L))
        acc(name) = (n + 1, tot + nanos)
      }
      // one warmup commit outside the measurement
      t.append(Seq((-1L, "w")).toDF("id", "s"))
      acc.clear(); jobs.set(0); jobMs.set(0L)
      val t0 = System.nanoTime()
      (0 until iters).foreach(i =>
        t.append(Seq((100000L + i, s"b$i")).toDF("id", "s")))
      val wallMs = (System.nanoTime() - t0) / 1e6
      MedallionTable.commitPhaseHook = MedallionTable.noopPhase
      println(f"%n== $tag (cdf=$cdf stats=$stats serial=$serial) " +
        f"$iters tiny appends: total=${wallMs}%.0f ms, " +
        f"floor=${wallMs / iters}%.1f ms/commit, " +
        f"jobs=${jobs.get / iters.toDouble}%.1f/commit " +
        f"(${jobMs.get / iters.toDouble}%.1f ms/commit in jobs) ==")
      acc.foreach { case (name, (n, tot)) =>
        println(f"  $name%-22s ${tot / 1e6 / iters}%8.2f ms/commit  (n=$n)")
      }
      sites.toSeq.sortBy(-_._2._2).take(6).foreach { case (site, (n, tot)) =>
        println(f"  [job] n=$n%3d ${tot / iters.toDouble}%6.1f ms/commit  $site")
      }
      sites.clear()
    }

    scenario("plain", cdf = false, stats = false, serial = false)
    scenario("plain-serial", cdf = false, stats = false, serial = true)
    scenario("stats", cdf = false, stats = true, serial = false)
    scenario("cdf+stats", cdf = true, stats = true, serial = false)
    spark.conf.unset("spark.graft.serialAppends")
    spark.stop()
  }
}
