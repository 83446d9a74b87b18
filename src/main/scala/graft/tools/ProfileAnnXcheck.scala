package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Half-by-half wall breakdown of the two round-11 ANN bench movers
  * (`sim_ann_xcheck`, `sim_ivfpq_topk`) — attributes a combined query's
  * time to its component pipelines so a regression can be located
  * instead of guessed. Diagnostic only; findings recorded in SCALING.md.
  * Usage: runMain graft.tools.ProfileAnnXcheck <sfDir>
  */
object ProfileAnnXcheck {
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
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm
    val emb = graft.Tables.embeddings(spark, sfDir)
    val dups = emb.filter($"vec_id" < 8)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val planted = emb.select($"vec_id", $"embedding").unionByName(dups)
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      time("planted count (scan+union)")(planted.count())
      time("Ann.topK (LSH half)")(
        graft.similarity.Ann.topK(planted, $"vec_id" < 8, k = 1).collect())
      time("Ivf.topK iterations=1 (IVF half)")(
        graft.similarity.Ivf.topK(planted, $"vec_id" < 8, k = 1,
          iterations = 1).collect())
      time("combined xcheck (join of both)")(
        graft.SparkEntry.queries("sim_ann_xcheck")(spark, sfDir).collect())
      time("IvfPq.topK default iters")(
        graft.similarity.IvfPq.topK(emb, col("vec_id") < 8, k = 5).collect())
      time("IvfPq.topK ivfIterations=1")(
        graft.similarity.IvfPq.topK(emb, col("vec_id") < 8, k = 5,
          ivfIterations = 1).collect())
      // sub-phase attribution of the IVFADC pipeline
      graft.similarity.IvfPq.profileBreakdown(emb,
        (label, thunk) => time(label)(thunk()))
    }
    spark.stop()
  }
}
