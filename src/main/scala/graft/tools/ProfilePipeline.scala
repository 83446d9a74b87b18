package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: per-stage wall times for the slow bench queries (not part
  * of the driver contract; run ad hoc with `runMain graft.tools.ProfilePipeline <sfDir>`).
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val work = graft.queries.Q.scratch(sfDir, "profile_pipeline")
    graft.queries.Q.deleteDir(spark, work)
    val raw = timed("raw landing")(graft.pipeline.Pipeline.Bronze.land(spark, sfDir))
    timed("bronze")(graft.pipeline.Pipeline.Bronze.run(spark, raw, work))
    timed("silver")(graft.pipeline.Pipeline.Silver.run(spark, work))
    timed("gold")(graft.pipeline.Pipeline.Gold.run(spark, work))
    timed("gold re-run (merge path)")(graft.pipeline.Pipeline.Gold.run(spark, work))

    timed("text_lm_score")(
      graft.text.NgramLM.selfScore(
        graft.Tables.documents(spark, sfDir), "doc_id", "text").count())
    timed("text_winnowing_fp")(
      graft.dedup.Winnowing.fingerprintIndex(
        graft.Tables.documents(spark, sfDir), "doc_id", "text").count())
    timed("sort_limit_topk")(
      graft.queries.Relational.defs("sort_limit_topk")(spark, sfDir).count())
    timed("sim_ann_ivf")(
      graft.queries.PipelineOpsQueries.defs("sim_ann_ivf")(spark, sfDir).count())
    spark.stop()
  }
}
