package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall breakdown of one registered query — where a
  * protocol-heavy scenario (standing-index builds) actually spends its
  * seconds. Usage: runMain graft.tools.ProfileStanding <sfDir> <query>
  */
object ProfileStanding {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("pipeline_curate_standing")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // match graft.Bench's session (round 19)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .filter(_.nonEmpty)
            .orElse(j.stageInfos.lastOption.map(si =>
              si.name + " | " + si.details.linesIterator
                .find(l => l.contains("graft.") && !l.contains("tools."))
                .getOrElse("")))
            .getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += ((j.jobId, System.currentTimeMillis() - t0, d))
        }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm (bench methodology measures the second run)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    jobs.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500)
    println(f"[prof] $name total=${total}%.0f ms, jobs=${jobs.size}, " +
      f"jobTime=${jobs.map(_._2).sum} ms")
    jobs.sortBy(-_._2).take(25).foreach { case (id, ms, d) =>
      println(f"[prof]   $ms%6d ms  job$id%-4d ${d.take(110)}")
    }
    spark.stop()
  }
}
