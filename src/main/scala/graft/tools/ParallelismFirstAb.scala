package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B of
  * `spark.sql.adaptive.coalescePartitions.parallelismFirst` over a set of
  * registered queries (the CachedAqeAb discipline: order alternates per
  * round so committer/codegen warm-up never lands on one arm).
  *
  * Why this flag: with parallelismFirst=true (Spark's default) AQE
  * coalesces small shuffles only down to ~totalBytes/defaultParallelism
  * (floored at minPartitionSize=1MB), i.e. a 10 MB shuffle on local[32]
  * still fans 10 tasks; =false targets advisoryPartitionSizeInBytes
  * (64 MB), i.e. one task. Guide §2.2 says size by bytes. At 100 TB
  * shuffles exceed the advisory size and the flag is moot — it only
  * governs the small-shuffle floor.
  *
  * Usage: runMain graft.tools.ParallelismFirstAb <sfDir> <rounds> <query>...
  */
object ParallelismFirstAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    def run(name: String, v: Boolean): Double = {
      spark.conf.set(key, v.toString)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      run(name, v = true) // discard: codegen/committer warm-up
      val on = collection.mutable.ArrayBuffer[Double]()
      val off = collection.mutable.ArrayBuffer[Double]()
      (0 until rounds).foreach { r =>
        if (r % 2 == 0) { on += run(name, v = true); off += run(name, v = false) }
        else { off += run(name, v = false); on += run(name, v = true) }
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $name%-32s parallelismFirst=true ${med(on.toSeq)}%6.2f s " +
        f"| false ${med(off.toSeq)}%6.2f s | true/false ${med(on.toSeq) / med(off.toSeq)}%5.2f " +
        f"(on=${on.map(x => f"$x%.2f").mkString(",")} off=${off.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
