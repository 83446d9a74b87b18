package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for type widening ([[graft.table.WideCols]]): on a
  * bench-scale table, what does the metadata-only `alterColumnType` cost
  * vs the rewrite it replaces (read + cast + overwrite), and what do
  * reads cost before/after — including the explicit-reader-schema path
  * that skips the footer-merge job while the overlay is live?
  * Usage: runMain graft.tools.WidenProbe <sfDir>
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.table._

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[widen] $what%-52s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").cast("int").as("k"),
        col("l_quantity").cast("float").as("q"),
        col("l_extendedprice").as("price"))
    val p = graft.queries.Q.scratch(sfDir, "widen_probe")
    Seq(p, p + "__graft_commits").foreach(graft.queries.Q.deleteDir(spark, _))
    val t = MedallionTable(spark, p)
    timed("seed table (narrow int/float)")(t.overwrite(li))
    val rows = t.read.count()
    println(s"[widen] rows: $rows")

    timed("read+agg, pre-widen (footer-merge resolution)")(
      t.read.agg(sum(col("q"))).head())
    timed("ALTER COLUMN k TYPE BIGINT (metadata-only)")(
      t.alterColumnType("k", "BIGINT"))
    timed("ALTER COLUMN q TYPE DOUBLE (metadata-only)")(
      t.alterColumnType("q", "DOUBLE"))
    timed("read+agg, post-widen cold (explicit reader schema)")(
      t.read.agg(sum(col("q"))).head())
    timed("read+agg, post-widen warm (schema memo)")(
      t.read.agg(sum(col("q"))).head())
    timed("post-widen append (canonicalized wide batch)")(
      t.append(li.limit(1000).withColumn("k", col("k") + 2000000000L)))
    timed("read+agg over mixed narrow/wide files")(
      t.read.agg(sum(col("q"))).head())

    // the alternative the overlay replaces: full rewrite-to-retype
    val p2 = graft.queries.Q.scratch(sfDir, "widen_probe_rw")
    Seq(p2, p2 + "__graft_commits").foreach(graft.queries.Q.deleteDir(spark, _))
    val t2 = MedallionTable(spark, p2)
    t2.overwrite(li)
    timed("rewrite-based retype (read+cast+overwrite), same table")(
      t2.overwrite(t2.read.withColumn("k", col("k").cast("bigint"))
        .withColumn("q", col("q").cast("double"))))

    spark.stop()
  }
}
