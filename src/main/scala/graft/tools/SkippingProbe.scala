package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.MedallionTable

/** Scale evidence for manifest file skipping + metadata aggregates on the
  * catalog surface: builds one range-clustered table WITH a stats
  * manifest and one identical table WITHOUT, then times (a) a selective
  * range query and (b) an ungrouped COUNT/MIN/MAX on both. Reports
  * min-of-3 warm timings plus the pruned plan's file count.
  *
  * Usage: runMain graft.tools.SkippingProbe [sfDir] [factor]
  */
object SkippingProbe {
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

    def build(name: String, stats: Boolean): String = {
      val p = graft.queries.Q.scratch(sfDir, name)
      graft.queries.Q.deleteDir(spark, p)
      val t = MedallionTable(spark, p)
      t.overwrite(fact.repartitionByRange(64, col("l_orderkey")))
      if (stats) t.refreshStats()
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING graft LOCATION '$p'")
      p
    }
    build("skipprobe_stats", stats = true)
    build("skipprobe_plain", stats = false)

    // ~10% of one copy's keyspace — a selective-but-nonempty slice
    val range = "WHERE l_orderkey BETWEEN 100000 AND 160000"
    def q(t: String) =
      s"SELECT l_orderkey, l_extendedprice FROM $t $range"
    def agg(t: String) =
      s"SELECT COUNT(*), MIN(l_orderkey), MAX(l_shipdate) FROM $t"

    def best(sql: String): Double =
      (1 to 3).map(_ => time(spark.sql(sql).queryExecution.toRdd
        .foreach(_ => ()))).min

    best(q("skipprobe_plain")); best(q("skipprobe_stats")) // warm
    val plan = spark.sql(q("skipprobe_stats"))
      .queryExecution.executedPlan.toString
    val pruned = "GraftPrunedScanRelation\\((\\d+) files\\)".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("?")
    println(f"PROBE skip rows=${n0 * factor} range_plain=${best(q("skipprobe_plain"))}%.2fs " +
      f"range_pruned=${best(q("skipprobe_stats"))}%.2fs files_opened=$pruned/64")
    println(f"PROBE agg rows=${n0 * factor} agg_scan=${best(agg("skipprobe_plain"))}%.2fs " +
      f"agg_manifest=${best(agg("skipprobe_stats"))}%.2fs")
    spark.stop()
  }
}
