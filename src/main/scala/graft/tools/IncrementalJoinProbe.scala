package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.{IncrementalJoin, MedallionTable}

/** Scale evidence for [[graft.table.IncrementalJoin]]: times a FULL
  * materialized-join recompute (fact ⋈ dim rebuilt and rewritten)
  * against the PRUNED incremental repair (dynamic-partition-overwrite
  * merge + deletion-vector removals) from a fixed-size, date-local fact
  * CDC batch — the production shape: the view partitioned by month, the
  * batch touching one month. At fact size 1× and `factor`×, the claim
  * under test is the shape: recompute rewrites O(fact ⋈ dim) (grows
  * with the factor) while the repair rewrites only the touched
  * partition (flat). The CDC feed is materialized outside both timings
  * — production gets it from the write path, not a post-hoc diff.
  *
  * Usage: runMain graft.tools.IncrementalJoinProbe [sfDir] [factor]
  */
object IncrementalJoinProbe {
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

    val on = Seq("o_custkey" -> "c_custkey")
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val o0 = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
    val n0 = o0.count()

    def run(mult: Int): (Double, Double, Long) = {
      val fact = (0 until mult).map { i =>
        o0.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 10_000_000L))
      }.reduce(_ unionByName _).localCheckpoint(true)
      val vp = graft.queries.Q.scratch(sfDir, s"ijprobe_view_$mult")
      graft.queries.Q.deleteDir(spark, vp)
      val mv = MedallionTable(spark, vp, partitionColumns = Seq("o_month"))
      mv.overwrite(IncrementalJoin.fullCompute(fact, dim, on))
      // date-local change batch: one month of COPY 0 takes a price bump.
      // Materialized before timing — production CDC comes from the write
      // path (changesSince / the CDC-emitting merge), not a table diff.
      val month = "1995-06"
      val changes = fact
        .filter(col("o_month") === month && col("o_orderkey") < 10_000_000L)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
        .withColumn("_change_type", lit("update_postimage"))
        .localCheckpoint(true)
      val nBatch = changes.count()
      val tRepair = time(IncrementalJoin.applyFactChanges(
        mv, changes, dim, Seq("o_orderkey"), on))
      val tRecompute = time(
        mv.overwrite(IncrementalJoin.fullCompute(fact, dim, on)))
      (tRepair, tRecompute, nBatch)
    }

    val (r1, f1, b1) = run(1)
    val (rN, fN, bN) = run(factor)
    println(f"PROBE incjoin rows=$n0 batch=$b1 repair_pruned=$r1%.2fs recompute=$f1%.2fs")
    println(f"PROBE incjoin rows=${n0 * factor} batch=$bN repair_pruned=$rN%.2fs recompute=$fN%.2fs")
    spark.stop()
  }
}
