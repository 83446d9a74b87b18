package graft.tools

import org.apache.spark.sql.SparkSession

/** In-epoch interleaved A/B of
  * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` (the one
  * engine-wide flag round 19 shipped) for the named queries — the round-19
  * verdict's open obligation: `pipeline_gold_e2e` (−24%) and
  * `sim_ivfpq_topk` (−22%) regressed in the same bench that shipped the
  * flag, with no per-query evidence either way. The flag is a dynamic SQL
  * conf read when a plan is cached, and every run here re-persists its
  * frames from scratch (clearCache between runs), so flipping it per run
  * inside ONE JVM gives interleaved same-epoch pairs.
  *
  * Usage: runMain graft.tools.CachedAqeAb <sfDir> <rounds> <query> [query ...]
  */
object CachedAqeAb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CachedAqeAb <sfDir> <rounds> <query>...")
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val acc = scala.collection.mutable.Map[(String, Boolean),
      scala.collection.mutable.ArrayBuffer[Double]]()
    // alternate the within-pair order per round: the first attempt of a
    // pair pays scratch-rebuild/committer warm-up (measured ~1-4 s on
    // pipeline_gold_e2e), which would otherwise bias whichever flag runs
    // first
    for (r <- 1 to rounds; name <- names;
         flag <- if (r % 2 == 1) Seq(true, false) else Seq(false, true)) {
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        flag.toString)
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(100)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      acc.getOrElseUpdate((name, flag),
        scala.collection.mutable.ArrayBuffer[Double]()) += s
      println(f"[ab] round=$r $name%-24s cachedAqe=$flag%-5s $s%6.2f s")
    }
    println("\n[ab] ===== summary (median over rounds) =====")
    names.foreach { name =>
      def med(flag: Boolean): Double = {
        val v = acc((name, flag)).sorted
        v(v.size / 2)
      }
      println(f"[ab] $name%-24s on=${med(true)}%6.2f s off=${med(false)}%6.2f s " +
        f"(off/on=${med(false) / med(true)}%5.2f)")
    }
    spark.stop()
  }
}
