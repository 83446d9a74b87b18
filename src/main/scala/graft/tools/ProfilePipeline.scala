package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Pipeline
import graft.queries.Q

/** Local profiling aid: per-stage wall-clock of the medallion pipeline. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val work = Q.scratch(sfDir, "pipeline_profile")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    (1 to 2).foreach { i =>
      println(s"--- run $i ---")
      t("total") {
        Q.deleteDir(spark, work)
        val raw = t("land")(Pipeline.Bronze.land(spark, sfDir))
        t("bronze")(Pipeline.Bronze.run(spark, raw, work))
        t("silver")(Pipeline.Silver.run(spark, work))
        t("gold")(Pipeline.Gold.run(spark, work))
        t("readback")(spark.read.option("mergeSchema", true)
          .parquet(s"$work/gold/wide_orders").write.format("noop")
          .mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
