package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the LSH near-dup query. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("warmup")(graft.Tables.documents(spark, sfDir).count())
    timed("dedup_lsh_near_pairs")(
      graft.queries.PipelineOpsQueries.defs("dedup_lsh_near_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    timed("text_winnow_pairs")(
      graft.SparkEntry.queries("text_winnow_pairs")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
