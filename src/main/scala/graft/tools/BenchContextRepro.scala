package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-context reproduction harness (round-18 verdict #2): the driver
  * bench reported `pipeline_curate_standing` at 32.8 s where the
  * same-epoch isolated measurement reads ~4.5 s warm — a 7× inflation
  * that only appears INSIDE a full 296-query bench run. This tool
  * reproduces the bench's exact measurement conditions with a
  * configurable amount of preceding context: run the first N catalog
  * queries (same map order, same noop sink, same GC-settle) and then
  * measure the target best-of-2. N = 0 is the isolated number; N = all
  * is the bench context; bisecting N attributes the inflation to a
  * prefix — or, if no N inflates, to cross-run host state.
  *
  * Usage: runMain graft.tools.BenchContextRepro <query> <prefixN|all> [reps]
  */
object BenchContextRepro {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("pipeline_curate_standing")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.network.timeout", "600s")
      .config("spark.rpc.askTimeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.LogNoise.silenceExpected()

    val all = graft.SparkEntry.queries.toSeq // bench's map order
    val prefixN = args.drop(1).headOption match {
      case Some("all") | None => all.size
      case Some(n) => n.toInt
    }
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)

    def runNoop(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    spark.range(1000).selectExpr("sum(id)").collect() // bench's warmup
    val prefix = all.filter(_._1 != target).take(prefixN)
    val tPrefix0 = System.nanoTime()
    prefix.foreach { case (n, fn) =>
      try runNoop(n, fn)
      catch { case e: Throwable =>
        System.err.println(s"[ctx] prefix $n failed: ${e.getMessage}") }
    }
    val prefixS = (System.nanoTime() - tPrefix0) / 1e9
    val fn = graft.SparkEntry.queries(target)
    val times = (1 to reps).map { _ =>
      spark.catalog.clearCache() // bench's per-query settle
      System.gc()
      Thread.sleep(100)
      runNoop(target, fn)
    }
    println(f"[ctxrepro] target=$target prefixN=${prefix.size} " +
      f"(prefix ran $prefixS%.0f s) attempts=${times.map(t => f"$t%.2f").mkString(",")} " +
      f"best=${times.min}%.2f s")
    spark.stop()
  }
}
