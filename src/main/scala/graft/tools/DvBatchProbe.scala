package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.{DvUpdates, MedallionTable}

/** Scale evidence for [[graft.table.MedallionTable.compactDvBatches]]:
  * every committed UPDATE/MERGE amendment batch adds one union branch
  * (its own file scan + per-branch DV anti-join) to EVERY read, so an
  * update-heavy table's read plan widens linearly between OPTIMIZE runs.
  * The probe applies N small vectored updates, times the amended read at
  * several batch counts, compacts, and times again — the claim is the
  * read cost returning to the single-batch level while the result stays
  * identical.
  *
  * Usage: runMain graft.tools.DvBatchProbe [sfDir] [nUpdates]
  */
object DvBatchProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").collect()

    val dir = graft.queries.Q.scratch(sfDir, "dvbatchprobe")
    graft.queries.Q.deleteDir(spark, dir)
    val t = MedallionTable(spark, dir)
    t.overwrite(graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .repartition(32))

    def readTime(): Double = {
      val runs = (1 to 3).map(_ => time {
        t.read.agg(count(lit(1)), sum($"o_totalprice")).collect()
      })
      runs.min
    }

    println(f"batches  0: read ${readTime()}%5.2f s")
    (1 to n).foreach { i =>
      t.updateVectored($"o_orderkey" % 9973 === i,
        Map("o_orderpriority" -> lit(s"U$i")))
      if (i % (n / 4) == 0)
        println(f"batches $i%2d: read ${readTime()}%5.2f s")
    }
    val rowsBefore = t.read.count()
    val folded = t.compactDvBatches()
    println(f"compacted $folded batches -> ${DvUpdates.committedBatches(spark, dir).size}")
    println(f"batches  1: read ${readTime()}%5.2f s  (rows ${t.read.count()} == $rowsBefore)")
    // construction vs execution breakdown on the single-batch table
    var df: org.apache.spark.sql.DataFrame = null
    val tCon = time { df = t.read }
    val tEx1 = time { df.agg(count(lit(1)), sum($"o_totalprice")).collect() }
    val tEx2 = time { df.agg(count(lit(1)), sum($"o_totalprice")).collect() }
    println(f"breakdown: construct $tCon%5.2f s   exec1 $tEx1%5.2f s   exec2 $tEx2%5.2f s")
    spark.stop()
  }
}
