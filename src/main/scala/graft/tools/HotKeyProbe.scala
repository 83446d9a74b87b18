package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key as-of join probe: measures the single-task window funnel that
  * `AsOfJoin.asOf` hits when one key dominates, against the salted
  * two-pass variant, on synthetic skewed tick data (one key holding
  * `skewPct`% of all rows, timestamps spread over a day — the
  * popular-instrument shape). Reported per variant: wall seconds,
  * best-of-2 after a warmup. SCALING.md "Joins" records the figures.
  *
  * Usage: runMain graft.tools.HotKeyProbe [rows] [skewPct] [buckets]
  */
object HotKeyProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    val skewPct = if (args.length > 1) args(1).toInt else 90
    val buckets = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    // key: skewPct% of rows on key 0, the rest spread over 256 keys;
    // time: deterministic pseudo-random millis within one day
    def side(seed: Int, frac: Double) = spark.range((rows * frac).toLong)
      .selectExpr(
        s"IF(pmod(id * 2654435761 + $seed, 100) < $skewPct, 0L, " +
          s"1 + pmod(id * 40503 + $seed, 256)) AS k",
        s"timestamp_millis(1704067200000 + pmod(id * 1103515245 + $seed, 86400000)) AS ts",
        "CAST(id AS DOUBLE) AS v")
    val left = side(1, 1.0).withColumnRenamed("v", "lv")
    // right unique per (k, ts): max-reduce collisions
    val right = side(2, 0.5).groupBy("k", "ts").agg(max("v").as("rv"))

    def run(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(f: => org.apache.spark.sql.DataFrame): Double = math.min(run(f), run(f))

    import graft.operators.AsOfJoin
    run(AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("rv"))) // warmup
    val tPlain = best2(AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("rv")))
    val tSalted = best2(
      AsOfJoin.asOfSalted(left, right, Seq("k"), "ts", Seq("rv"), buckets))
    println(f"[hotkey] rows=$rows skew=$skewPct%% buckets=$buckets " +
      f"plain=$tPlain%.2f s salted=$tSalted%.2f s speedup=${tPlain / tSalted}%.2f x")
    spark.stop()
  }
}
