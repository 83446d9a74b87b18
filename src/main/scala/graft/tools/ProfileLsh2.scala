package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diag: LSH bucket and candidate-pair cardinalities. */
object ProfileLsh2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir)
    val bands = docs
      .selectExpr("doc_id", "explode(graft_xx_minhash_bands(text, 16, 4, 3)) AS b")
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
    val buckets = bands.groupBy("band_idx", "band_hash").count()
    buckets.orderBy(desc("count")).show(10)
    println("pairs = " + buckets.agg(sum(col("count") * (col("count") - 1) / 2))
      .head().get(0))
    spark.stop()
  }
}
