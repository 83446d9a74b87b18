package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Warm-run job census over MANY registered queries in one JVM — the
  * round-19 survey loop: for each query, run once cold (discarded), then
  * measure the warm run's wall, Spark-job count, summed job time, and the
  * top job sites. The warm/cold split mirrors Bench's best-of-2 (codegen
  * and committer state amortized), one JVM across queries keeps probes
  * comparable. Diagnostic only.
  *
  * Usage: runMain graft.tools.ProfileMany <sfDir> <query> [query ...]
  */
object ProfileMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileMany <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // A/B hook: SPARK_GRAFT_AQE=false runs the survey with adaptive
      // execution off, isolating AQE's per-stage job overhead at tiny SFs
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // A/B hook: AQE on cached-plan shuffles (default false in Spark —
      // cached frames otherwise run their shuffles at the raw
      // shuffle.partitions count with no coalescing)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = scala.collection.mutable.ArrayBuffer[(Long, Int, String)]()
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          j.stageInfos.map(_.numTasks).sum,
          j.stageInfos.lastOption.map(si => si.name + " @ " +
            si.details.linesIterator
              .filter(l => l.contains("graft.") && !l.contains("graft.tools"))
              .take(1).mkString).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, nt, site) =>
          jobs.synchronized {
            jobs += ((System.currentTimeMillis() - t0, nt, site))
          }
        }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // cold
      Thread.sleep(300)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let stragglers land in the census
      val snap = jobs.synchronized(jobs.toVector)
      val jobMs = snap.map(_._1).sum
      println(f"[many] $name%-32s warm=${wallMs}%7.0f ms jobs=${snap.size}%3d " +
        f"jobMs=$jobMs%6d driverMs=${wallMs - jobMs}%7.0f " +
        f"tasks=${snap.map(_._2).sum}")
      val bySite = snap.groupBy(_._3).map { case (s, v) =>
        (v.map(_._1).sum, v.size, v.map(_._2).sum, s)
      }.toSeq.sortBy(-_._1).take(6)
      bySite.foreach { case (ms, n, nt, s) =>
        println(f"[many]    $ms%6d ms n=$n%-3d tasks=$nt%-5d ${s.take(95)}")
      }
    }
    spark.stop()
  }
}
