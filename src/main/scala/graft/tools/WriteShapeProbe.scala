package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.MedallionTable

/** Files-per-commit census for the adaptive write clustering (round 19):
  * tiny local-relation append, small scan-fed append, partitioned
  * clustered append — prints the parquet file count each commit leaves,
  * verifying clusterSmallWrite collapses micro-batches to one file (or
  * one per partition value) without touching explicitly-repartitioned
  * writes. Usage: runMain graft.tools.WriteShapeProbe [sfDir]
  */
object WriteShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // A/B hook: SPARK_GRAFT_SMALLWRITE=0 disables the adaptive clustering
      .config("spark.graft.smallWriteClusterBytes",
        sys.env.getOrElse("SPARK_GRAFT_SMALLWRITE", (128L * 1024 * 1024).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def parquets(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }

    // 1. local-relation micro-batches
    val p1 = java.nio.file.Files.createTempDirectory("wsp1").toString + "/t"
    val t1 = MedallionTable(spark, p1)
    t1.overwrite((0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    println(s"[shape] local overwrite 1000 rows: files=${parquets(p1)}")
    t1.append((0 until 50).map(i => (i.toLong, s"w$i")).toDF("id", "s"))
    println(s"[shape] + local append 50 rows: files=${parquets(p1)}")

    // 2. small scan-fed append (filter of a real table)
    val t2 = MedallionTable(spark,
      java.nio.file.Files.createTempDirectory("wsp2").toString + "/t")
    val o = graft.Tables.orders(spark, sfDir)
    t2.overwrite(o.filter($"o_orderkey" % 4 === 0))
    println(s"[shape] scan-fed overwrite (~37k rows): files=${parquets(t2.path)}")

    // 3. partitioned + shuffle-fed (the standing-index shape)
    val t3 = MedallionTable(spark,
      java.nio.file.Files.createTempDirectory("wsp3").toString + "/t",
      partitionColumns = Seq("k"))
    t3.overwrite((0 until 2000).map(i => (i % 8, i.toLong)).toDF("k", "v")
      .groupBy("k").count())
    println(s"[shape] partitioned agg-fed overwrite (8 cells): files=${parquets(t3.path)}")

    // 4. explicit repartition root must be left alone
    val t4 = MedallionTable(spark,
      java.nio.file.Files.createTempDirectory("wsp4").toString + "/t")
    t4.overwrite((0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartitionByRange(10, $"id"))
    println(s"[shape] explicit repartitionByRange(10): files=${parquets(t4.path)}")
    spark.stop()
  }
}
