package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the bronze stage internals (mirrors Pipeline.Bronze). */
object ProfileBronze {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val work = graft.queries.Q.scratch(sfDir, "profile_bronze")
    graft.queries.Q.deleteDir(spark, work)
    val raw = timed("landing")(graft.pipeline.Pipeline.Bronze.land(spark, sfDir))

    val orders = timed("csv infer orders")(
      spark.read.option("header", true).option("inferSchema", true)
        .csv(s"$raw/orders"))
    val lineitem = timed("csv infer lineitem")(
      spark.read.option("header", true).option("inferSchema", true)
        .csv(s"$raw/lineitem"))
    timed("append orders")(
      graft.table.MedallionTable(spark, s"$work/bronze/orders", Seq("data_block_id"))
        .append(orders.withColumn("data_block_id", ($"o_orderkey" % 4).cast("int"))
          .repartition($"data_block_id")))
    timed("append lineitem")(
      graft.table.MedallionTable(spark, s"$work/bronze/lineitem", Seq("data_block_id"))
        .append(lineitem.withColumn("data_block_id", ($"l_orderkey" % 4).cast("int"))
          .repartition($"data_block_id")))
    timed("json nation + overwrite")({
      val nation = spark.read.json(s"$raw/nation")
      graft.table.MedallionTable(spark, s"$work/bronze/nation").overwrite(nation)
    })
    spark.stop()
  }
}
