package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.{BloomIndex, MedallionTable}

/** Scale evidence for bloom-index point-lookup skipping
  * ([[graft.table.BloomIndex]]) on the layout min/max stats CANNOT
  * prune: a date-clustered fact whose key values stripe across every
  * file. Builds the same table with a stats manifest only and with
  * manifest + bloom index, runs a 5-key IN lookup on both, and reports
  * min-of-3 warm timings plus each plan's opened-file count.
  *
  * Usage: runMain graft.tools.BloomProbe [sfDir] [factor]
  */
object BloomProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.lineitem(spark, sfDir)
    val n0 = base.count()
    val fact = (0 until factor).map { i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10_000_000L))
    }.reduce(_ unionByName _)

    // date-clustered (the natural log layout): every file's l_orderkey
    // [min,max] spans the domain — the manifest cannot prune a key lookup
    def build(name: String, bloom: Boolean): String = {
      val p = graft.queries.Q.scratch(sfDir, name)
      graft.queries.Q.deleteDir(spark, p)
      val t = MedallionTable(spark, p)
      t.overwrite(fact.repartitionByRange(64, col("l_shipdate"), col("l_orderkey")))
      t.refreshStats()
      if (bloom) BloomIndex.build(spark, p, "l_orderkey")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING graft LOCATION '$p'")
      p
    }
    build("bloomprobe_plain", bloom = false)
    build("bloomprobe_bloom", bloom = true)

    val q = (t: String) =>
      s"SELECT l_orderkey, l_extendedprice FROM $t WHERE l_orderkey IN " +
        "(19, 4242, 120007, 10000019, 30000019)"
    def best(sql: String): Double =
      (1 to 3).map(_ => time(spark.sql(sql).queryExecution.toRdd
        .foreach(_ => ()))).min
    def opened(t: String): String = {
      val plan = spark.sql(q(t)).queryExecution.executedPlan.toString
      "GraftPrunedScanRelation\\((\\d+) files\\)".r
        .findFirstMatchIn(plan).map(_.group(1)).getOrElse("64")
    }

    best(q("bloomprobe_plain")); best(q("bloomprobe_bloom")) // warm
    println(f"PROBE bloom rows=${n0 * factor} " +
      f"lookup_stats_only=${best(q("bloomprobe_plain"))}%.2fs " +
      f"(files ${opened("bloomprobe_plain")}/64) " +
      f"lookup_bloom=${best(q("bloomprobe_bloom"))}%.2fs " +
      f"(files ${opened("bloomprobe_bloom")}/64)")
    spark.stop()
  }
}
