package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase wall for the curation funnel (`pipeline_curate_standing`) —
  * where do the two curateBatch landings spend their seconds?
  * Usage: runMain graft.tools.ProfileCurate <sfDir>
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[curate] $what%-32s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (0 until 2).foreach { round =>
      println(s"[curate] ---- round $round ${if (round==0) "(cold)" else "(warm)"}")
      val p = graft.queries.Q.scratch(sfDir, "curate_prof")
      graft.queries.Q.deleteDir(spark, p)
      val docs = graft.Tables.documents(spark, sfDir).selectExpr("doc_id",
        "CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0 " +
          s"THEN CONCAT(text, ' ${graft.queries.TextQueries.DecontCanary}') ELSE text END AS text")
      time("decont ingest")(
        new graft.text.DecontaminationIndex(spark, s"$p/decont")
          .ingest(docs.filter($"doc_id" % 97 === 0), tag = 1L))
      val quality = expr(s"SIZE(${graft.queries.Q.TokensExpr}) >= 5")
      val curated = s"$p/curated"
      // curateBatch inlined with phase timers
      def batchPhase(b0: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val b = b0.persist()
        val gated = b.filter(quality)
        val dec = new graft.text.DecontaminationIndex(spark, s"$p/decont")
        val q = time(s"b$batchId decont join+persist") {
          val q0 = gated.join(
            dec.check(gated).filter(!col("contaminated")).select("doc_id"),
            Seq("doc_id")).persist()
          q0.count(); q0
        }
        val idx = new graft.dedup.StandingDedupIndex(
          spark, s"$p/dedup", graft.queries.TextQueries.md5LshBands)
        // round 16: checkAndIngest — one shared signature computation
        // feeds the check, the curated write, and the ingest commit
        var tWrite = 0.0
        val t0 = System.nanoTime()
        idx.checkAndIngest(q, batchId) { report =>
          val w0 = System.nanoTime()
          q.join(report.filter(!col("is_exact_dup"))
              .select(col("doc_id"), col("n_candidates")), Seq("doc_id"))
            .write.mode("overwrite")
            .parquet(s"$curated/ingest_batch_id=$batchId")
          tWrite = (System.nanoTime() - w0) / 1e9
        }
        val tAll = (System.nanoTime() - t0) / 1e9
        println(f"[curate] b$batchId curated write (in pass)    $tWrite%.2f s")
        println(f"[curate] b$batchId check+ingest rest          ${tAll - tWrite}%.2f s")
        q.unpersist(); b.unpersist()
      }
      batchPhase(docs.filter($"doc_id" < 250), 0L)
      batchPhase(docs.filter($"doc_id" >= 250), 1L)
      time("final read")(
        spark.read.parquet(curated).count())
    }
    spark.stop()
  }
}
