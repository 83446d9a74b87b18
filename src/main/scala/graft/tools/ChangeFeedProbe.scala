package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the writer-captured change feed
  * ([[graft.table.ChangeFeed]]): separates plan CONSTRUCTION from
  * EXECUTION (the DvBatchProbe lesson — wall time alone misattributes)
  * across the two axes that matter at 100 TB:
  *
  *   1. commit-count axis: a feed read over N delete commits builds N
  *      branch reads + ONE positional join — construction should grow
  *      ~linearly in N (Catalyst analysis per branch), execution with
  *      the marked-file bytes;
  *   2. data axis: the same 3-commit churn over a 1× vs 8× corpus —
  *      construction should stay flat, execution O(touched files),
  *      NEVER O(table) (the snapshot-diff alternative is O(table) by
  *      construction, measured alongside).
  *
  * Usage: runMain graft.tools.ChangeFeedProbe <sfDir>
  */
object ChangeFeedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.table._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- axis 1: commit count --------------------------------------------
    Seq(5, 20, 50).foreach { n =>
      val p = graft.queries.Q.scratch(sfDir, s"cfprobe_n$n")
      Seq(p, p + "__graft_commits").foreach(graft.queries.Q.deleteDir(spark, _))
      val t = MedallionTable(spark, p)
      t.overwrite(graft.Tables.orders(spark, sfDir)
        .select($"o_orderkey", $"o_totalprice"))
      t.enableChangeDataFeed()
      val en = t.commitVersion
      (0 until n).foreach(i => t.deleteVectored($"o_orderkey" % 1000 === i))
      val (df, construct) = timed(t.readChangeFeed(en + 1))
      val (cnt, exec) = timed(df.count())
      println(f"[cfprobe] commits=$n%-3d construct=$construct%6.2f s " +
        f"exec=$exec%6.2f s rows=$cnt")
    }

    // ---- axis 2: data size (fixed 3-commit churn) ------------------------
    Seq(1, 8).foreach { mult =>
      val p = graft.queries.Q.scratch(sfDir, s"cfprobe_x$mult")
      Seq(p, p + "__graft_commits").foreach(graft.queries.Q.deleteDir(spark, _))
      val t = MedallionTable(spark, p, retainVersions = 2)
      val base = graft.Tables.orders(spark, sfDir)
        .select($"o_orderkey", $"o_totalprice")
      val big = (0 until mult).map(i =>
          base.withColumn("o_orderkey", $"o_orderkey" + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
      // key-clustered layout (what OPTIMIZE ZORDER / clusterBy maintains
      // at scale): each file holds a key range, so a key-local churn
      // touches FEW files and the positional reconstruction reads only
      // those — the property that keeps the feed read O(touched files)
      t.overwrite(big.repartitionByRange(32, $"o_orderkey"))
      t.enableChangeDataFeed()
      val en = t.commitVersion
      t.append(base.filter($"o_orderkey" % 500 === 1)
        .withColumn("o_orderkey", $"o_orderkey" + 90000000L))
      t.updateVectored($"o_orderkey" >= 7000 && $"o_orderkey" < 8000,
        Map("o_totalprice" -> ($"o_totalprice" + 1.0)))
      t.deleteVectored($"o_orderkey" >= 9000 && $"o_orderkey" < 9500)
      val (df, construct) = timed(t.readChangeFeed(en + 1))
      val (cnt, exec) = timed(df.count())
      // the lower bound of ANY O(table) alternative (snapshot diff,
      // full recompute): one full scan of the live table
      val (tblCnt, scanExec) = timed(t.read.count())
      println(f"[cfprobe] corpus=${mult}x construct=$construct%6.2f s " +
        f"exec=$exec%6.2f s rows=$cnt   full-scan=$scanExec%6.2f s " +
        f"(rows=$tblCnt)")
    }
    spark.stop()
  }
}
