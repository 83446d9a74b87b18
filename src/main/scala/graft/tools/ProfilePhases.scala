package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-annotated job census of the standing-IVFADC scenario: wraps each
  * protocol step (train / ingest / replay / query) in a job description so
  * the per-phase job counts and wall are attributable. Diagnostic only.
  * Usage: runMain graft.tools.ProfilePhases <sfDir>
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val agg = scala.collection.mutable.LinkedHashMap[String, (Int, Long)]()
    val detail = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?"),
          j.stageInfos.lastOption.map(si => si.name + " <- " +
            si.details.linesIterator
              .filter(l => l.contains("graft.") && !l.contains("graft.tools"))
              .take(2).mkString(" ; ")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d, site) =>
          val ms = System.currentTimeMillis() - t0
          val (n, tot) = agg.getOrElse(d, (0, 0L))
          agg(d) = (n + 1, tot + ms)
          detail += ((d, ms, site))
        }
    })

    def run(): Unit = {
      val p = graft.queries.Q.scratch(sfDir, "profile_phases")
      graft.queries.Q.deleteDir(spark, p)
      val emb = graft.Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding")
      val idx = new graft.similarity.StandingAnnIndex(spark, p)
      def phase[T](name: String)(f: => T): T = {
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        val r = f
        println(f"[phase] $name%-10s wall=${(System.nanoTime() - t0) / 1e6}%7.0f ms")
        r
      }
      phase("train") {
        idx.trainIvfPq(emb.filter($"vec_id" < 200), nCells = 16, m = 8,
          kCent = 16, ivfIterations = 1, pqIterations = 0)
      }
      phase("ingest1") {
        idx.ingestIvfPq(emb.filter($"vec_id" >= 200 && $"vec_id" < 400), tag = 1L)
      }
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      phase("ingest2") {
        idx.ingestIvfPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L)
      }
      phase("replay2") {
        idx.ingestIvfPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L)
      }
      phase("query") {
        idx.queryIvfPq(emb.filter($"vec_id" < 8), k = 1)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.setJobDescription(null)
    }

    run() // warm
    agg.clear(); detail.clear()
    val t0 = System.nanoTime()
    run()
    Thread.sleep(500)
    println(f"[prof] total=${(System.nanoTime() - t0) / 1e6}%.0f ms")
    agg.toSeq.sortBy(-_._2._2).foreach { case (d, (n, ms)) =>
      println(f"[prof]   $ms%6d ms  n=$n%-3d $d")
    }
    detail.foreach { case (ph, ms, site) =>
      println(f"[job]  $ph%-10s $ms%5d ms  ${site.take(150)}")
    }
    spark.stop()
  }
}
