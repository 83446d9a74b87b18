package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.MedallionTable

/** Scale evidence for deletion vectors vs rewrite deletes: the same
  * selective DELETE (≈0.1% of rows) against the same ×N lineitem table,
  * once through [[MedallionTable.delete]] (full rewrite) and once
  * through [[MedallionTable.deleteVectored]] (position sidecar), plus
  * the post-delete read cost of each. Reports wall times and the data
  * bytes each path wrote.
  *
  * Usage: runMain graft.tools.DvProbe [sfDir] [factor]
  */
object DvProbe {
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

    def build(name: String): (MedallionTable, String) = {
      val p = graft.queries.Q.scratch(sfDir, name)
      graft.queries.Q.deleteDir(spark, p)
      val t = MedallionTable(spark, p)
      t.overwrite(fact.repartition(64))
      (t, p)
    }
    def bytes(p: String, sub: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      val f = new java.io.File(p, sub)
      if (f.exists()) walk(f) else 0L
    }
    // ~0.1% of rows — the GDPR-erasure shape
    val cond = col("l_orderkey") % 1000 === 7

    val (tRw, pRw) = build("dvprobe_rewrite")
    val bytesBefore = bytes(pRw, "")
    val tRewrite = time(tRw.delete(cond))
    val (tDv, pDv) = build("dvprobe_vector")
    val tVector = time(tDv.deleteVectored(cond))
    val dvBytes = bytes(pDv, "_graft_meta/dv")
    def readTime(t: MedallionTable): Double =
      (1 to 3).map(_ => time(t.read.queryExecution.toRdd.foreach(_ => ()))).min
    println(f"PROBE dv rows=${n0 * factor} del_rewrite=$tRewrite%.2fs " +
      f"(rewrote ${bytesBefore / 1000000}MB) del_vector=$tVector%.2fs " +
      f"(wrote ${dvBytes / 1000}KB) " +
      f"read_rewritten=${readTime(tRw)}%.2fs read_vectored=${readTime(tDv)}%.2fs")
    spark.stop()
  }
}
