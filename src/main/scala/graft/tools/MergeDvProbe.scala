package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.table.{MedallionTable, MergeOps}
import graft.table.MergeOps._

/** Scale evidence for [[graft.table.MedallionTable.mergeVectored]]: times
  * a FIXED-size upsert batch applied via the rewrite merge (mergeClauses)
  * against the deletion-vector merge, at table size 1× and `factor`×. The
  * claim under test is the shape — the rewrite pays O(table) (a full-outer
  * shuffle of the table plus a full rewrite, so time grows with the
  * factor) while the vectored merge pays ONE broadcast-join pass over the
  * table and O(batch) writes (marks + one staged batch), so its time
  * stays near-flat as the table grows. Also reports the read-back cost of
  * the amended table, pricing the overhead the marks add until OPTIMIZE.
  *
  * Usage: runMain graft.tools.MergeDvProbe [sfDir] [factor]
  */
object MergeDvProbe {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").collect()

    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")

    // Fixed-size upsert batch: 1000 updates + 200 inserts, independent of
    // the table scale — the daily-merge shape.
    val batch = orders.filter($"o_orderkey" % 599 === 0).limit(1000)
      .select($"o_orderkey".as("k"), lit("3-MEDIUM").as("pri"))
      .unionByName(orders.filter($"o_orderkey" % 2995 === 0).limit(200)
        .select(($"o_orderkey" + 100000000L).as("k"), lit("5-LOW").as("pri")))
      .cache()
    batch.count()

    val matched = Seq[WhenClause](WhenMatchedUpdate(None,
      Map("o_orderpriority" -> ((_: ColRef, s: ColRef) => s("pri")))))
    val notMatched = Seq(WhenNotMatchedInsert(None, Map(
      "o_orderkey" -> ((_: ColRef, s: ColRef) => s("k")),
      "o_custkey" -> ((_: ColRef, _: ColRef) => lit(1L)),
      "o_orderstatus" -> ((_: ColRef, _: ColRef) => lit("I")),
      "o_totalprice" -> ((_: ColRef, _: ColRef) => lit(0.0)),
      "o_orderpriority" -> ((_: ColRef, s: ColRef) => s("pri")))))

    // Bytes (re)written by the merge — files created/touched after t0.
    // This is the noise-free form of the scale claim: wall time at small
    // SF is fixed-protocol-dominated, but bytes written IS the write
    // amplification a 100 TB table pays.
    def bytesWrittenSince(dir: String, t0: Long): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir))
        .filter(f => f.getName.endsWith(".parquet") && f.lastModified() >= t0)
        .map(_.length()).sum
    }

    def runAt(k: Int): (Double, Double, Double, Long, Long) = {
      def seed(tag: String): (MedallionTable, String) = {
        val dir = graft.queries.Q.scratch(sfDir, s"mdvprobe_${tag}_x$k")
        graft.queries.Q.deleteDir(spark, dir)
        val t = MedallionTable(spark, dir)
        val big = (0 until k).map(i =>
          orders.withColumn("o_orderkey", $"o_orderkey" + i * 10000000L))
          .reduce(_ unionByName _)
        t.overwrite(big.repartition(32))
        (t, dir)
      }
      val (tRewrite, dRewrite) = seed("rw")
      val t0r = System.currentTimeMillis()
      val rewrite = time {
        tRewrite.mergeClauses(batch, Seq("o_orderkey" -> "k"), matched,
          notMatched, Nil, checkUniqueKeys = false)
      }
      val rwBytes = bytesWrittenSince(dRewrite, t0r)
      val (tDv, dDv) = seed("dv")
      val t0d = System.currentTimeMillis()
      val vectored = time {
        tDv.mergeVectored(batch, Seq("o_orderkey" -> "k"), matched,
          notMatched, checkUniqueKeys = false)
      }
      val dvBytes = bytesWrittenSince(dDv, t0d)
      val readBack = time { tDv.read.agg(count(lit(1))).collect() }
      (rewrite, vectored, readBack, rwBytes, dvBytes)
    }

    val (rw1, dv1, rb1, rwB1, dvB1) = runAt(1)
    val (rwK, dvK, rbK, rwBK, dvBK) = runAt(factor)
    def mb(b: Long) = b / 1048576.0
    println(f"table  1x : rewrite $rw1%6.2f s / ${mb(rwB1)}%8.1f MB written   dv $dv1%6.2f s / ${mb(dvB1)}%6.2f MB   amended read $rb1%5.2f s")
    println(f"table ${factor}%2dx : rewrite $rwK%6.2f s / ${mb(rwBK)}%8.1f MB written   dv $dvK%6.2f s / ${mb(dvBK)}%6.2f MB   amended read $rbK%5.2f s")
    println(f"write amplification growth: rewrite x${rwBK.toDouble / rwB1}%5.1f   dv x${dvBK.toDouble / math.max(dvB1, 1)}%4.1f  (fixed-size batch)")
    spark.stop()
  }
}
