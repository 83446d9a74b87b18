package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-14 feed retention janitor
  * ([[graft.table.ChangeFeed.expireOlderThan]]): at a high commit count,
  * what does (a) the janitor itself cost, (b) the nothing-expirable
  * fast path that rides every vacuum/autoCompact, and (c) a post-expiry
  * feed read of the surviving window — vs the same read before expiry?
  * Usage: runMain graft.tools.RetentionProbe <sfDir>
  */
object RetentionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.table._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[retention] $what%-42s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val p = graft.queries.Q.scratch(sfDir, "retention_probe")
    Seq(p, p + "__graft_commits").foreach(graft.queries.Q.deleteDir(spark, _))
    val t = MedallionTable(spark, p)
    t.overwrite((0L until 5000L).map(i => (i, i % 7)).toDF("id", "g")
      .repartition(4, col("id")))
    t.enableChangeDataFeed()
    val en = t.commitVersion
    val n = 120
    timed(s"$n append commits") {
      (0 until n).foreach(i =>
        t.append(Seq((100000L + i, (i % 7).toLong)).toDF("id", "g")))
    }
    val head = ChangeFeed.capturedThrough(t)
    timed(s"feed read, full $n-commit range (pre-expiry)")(
      t.readChangeFeed(en + 1, head).count())
    timed("nothing-expirable fast path (fresh manifests, 30d horizon)")(
      ChangeFeed.expireOlderThan(t, 30L * 24 * 3600 * 1000))
    timed("capturedThrough (head walk)")(ChangeFeed.capturedThrough(t))
    val e = timed(s"expire all but last 10 of $n")(t.expireChangeFeed(10))
    println(s"[retention] expired through $e (head $head)")
    timed("feed read, surviving 10-commit window (post-expiry)")(
      t.readChangeFeed(e + 1, head).count())
    val refused =
      try { t.readChangeFeed(en + 1, head).count(); "NOT refused (BUG)" }
      catch { case ex: IllegalStateException =>
        if (ex.getMessage.contains("retention")) "refused with hatch" else ex.getMessage }
    println(s"[retention] expired-range read: $refused")
    spark.stop()
  }
}
