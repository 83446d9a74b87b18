package graft.tools

import org.apache.spark.sql.SparkSession

/** Within-epoch A/B of the footer-derived incremental stats path
  * (`spark.graft.footerStats`) on the commit-heavy catalog queries —
  * same JVM, interleaved on/off reps, so host-epoch variance cancels
  * (the repo's standing rule for judging commit-heavy changes).
  *
  * Usage: runMain graft.tools.FooterAbProbe <sfDir> <query> [query ...]
  */
object FooterAbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FooterAbProbe <sfDir> <query>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- args.tail) {
      val times = scala.collection.mutable.Map[(Boolean, Int), Double]()
      // interleave: on,off,on,off — rep 0 is the warm-up pair
      for (rep <- 0 to 1; footer <- Seq(true, false)) {
        spark.conf.set("spark.graft.footerStats", footer.toString)
        System.gc(); Thread.sleep(100)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        times((footer, rep)) = (System.nanoTime() - t0) / 1e9
      }
      spark.conf.unset("spark.graft.footerStats")
      println(f"[ab] $name%-30s footerON " +
        f"${times((true, 0))}%.2f/${times((true, 1))}%.2f s   " +
        f"footerOFF ${times((false, 0))}%.2f/${times((false, 1))}%.2f s")
    }
    spark.stop()
  }
}
