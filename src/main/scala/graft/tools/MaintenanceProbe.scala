package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-11 maintenance ops' scale economics on the sf0.1
  * lineitem table: partition-scoped OPTIMIZE WHERE vs full OPTIMIZE
  * (bytes rewritten + wall), CONVERT-in-place (metadata-only adoption),
  * and COPY INTO's incremental/no-op costs. Backs the SCALING.md
  * round-11 maintenance figures.
  *
  * Usage: runMain graft.tools.MaintenanceProbe [sfDir] [nParts]
  */
object MaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nParts = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def wipe(p: String) = fs.delete(new org.apache.hadoop.fs.Path(p), true)
    def bytes(p: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var b = 0L
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.toString.contains("_graft_meta")) b += st.getLen
      }
      b
    }
    def stamps(p: String): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.toString.contains("_graft_meta"))
          b += st.getPath.toString -> st.getModificationTime
      }
      b.result()
    }
    def timed[T](body: => T): (T, Long) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1000000)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("blk", (col("l_orderkey") % nParts).cast("int"))

    def build(p: String): graft.table.MedallionTable = {
      wipe(p); wipe(p + "__graft_commits")
      val t = graft.table.MedallionTable(spark, p,
        partitionColumns = Seq("blk"))
      // three appends → three files per partition (compaction fodder)
      (0 until 3).foreach(i =>
        t.append(li.filter(col("l_orderkey") % 3 === i).repartition(4)))
      t
    }

    val base = "/tmp/graft_scratch/maintenance_probe"

    // full OPTIMIZE
    val tf = build(s"$base/full")
    val total = bytes(tf.path)
    val (_, fullMs) = timed(tf.compact())

    // scoped OPTIMIZE WHERE (1 of nParts partitions)
    val ts = build(s"$base/scoped")
    val before = stamps(ts.path)
    val (_, scopedMs) = timed(
      ts.compactWhere(col("blk") === 0, refreshManifest = false))
    val after = stamps(ts.path)
    val rewritten = after.filter { case (f, m) => before.get(f) != Some(m) }
      .keys.map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen)
      .sum
    val untouched = after.count { case (f, m) => before.get(f) == Some(m) }

    println(f"[probe] optimize: total=${total / 1e6}%.1f MB full=${fullMs} ms; " +
      f"scoped(1/$nParts) rewrote ${rewritten / 1e6}%.1f MB in ${scopedMs} ms, " +
      s"$untouched files untouched")

    // CONVERT in place: plain dir → governed table, data bytes unmoved
    val cp = s"$base/convert"
    wipe(cp); wipe(cp + "__graft_commits")
    li.write.partitionBy("blk").parquet(cp)
    val ct = graft.table.MedallionTable(spark, cp,
      partitionColumns = Seq("blk"))
    val (_, convertMs) = timed(ct.convertInPlace(withStats = false))
    val (_, convertStatsMs) = timed(ct.refreshStats())
    println(f"[probe] convert: ${bytes(cp) / 1e6}%.1f MB adopted in ${convertMs} ms " +
      f"(metadata only); + ${convertStatsMs} ms to arm stats (the optional O(table) scan)")

    // COPY INTO: incremental load, then a no-op re-run
    val src = s"$base/landing"
    val tp = s"$base/copied"
    wipe(src); wipe(tp); wipe(tp + "__graft_commits")
    li.filter(col("l_orderkey") % 2 === 0).write.parquet(s"$src/b1")
    val tc = graft.table.MedallionTable(spark, tp)
    val (r1, loadMs) = timed(graft.table.CopyInto.copyInto(tc, src))
    li.filter(col("l_orderkey") % 2 === 1).write.parquet(s"$src/b2")
    val (r2, incMs) = timed(graft.table.CopyInto.copyInto(tc, src))
    val (r3, noopMs) = timed(graft.table.CopyInto.copyInto(tc, src))
    println(s"[probe] copy-into: first ${r1.filesLoaded} files ${loadMs} ms; " +
      s"incremental ${r2.filesLoaded} files ${incMs} ms; " +
      s"re-run ${r3.filesLoaded} files ${noopMs} ms")
    spark.stop()
  }
}
