package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Phase timing for the k14 CDF protocol queries — where do the
  * driver-synchronized rounds go? (construct-vs-execute attribution in
  * the DvBatchProbe tradition.)
  */
object CdfProbe {
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
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val p = graft.queries.Q.scratch(sfDir, "cdfprobe_src")
    val mp = graft.queries.Q.scratch(sfDir, "cdfprobe_dst")
    Seq(p, p+"__graft_commits", mp, mp+"__graft_commits")
      .foreach(graft.queries.Q.deleteDir(spark, _))
    val t = MedallionTable(spark, p)
    val m = MedallionTable(spark, mp)
    val o = graft.Tables.orders(spark, sfDir).filter($"o_orderkey" % 4 === 1)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
    time("overwrite")(t.overwrite(o))
    time("enable")(t.enableChangeDataFeed())
    time("bootstrap replicate")(ChangeFeed.replicateTo(t, m, Seq("o_orderkey")))
    time("append")(t.append(o.filter($"o_orderkey" % 89 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + 40000000L)))
    time("update1")(t.updateVectored($"o_orderkey" % 30 === 1,
      Map("o_orderpriority" -> lit("M1"))))
    time("update2")(t.updateVectored($"o_orderkey" % 60 === 1,
      Map("o_orderpriority" -> lit("M2"))))
    time("delete")(t.deleteVectored($"o_orderkey" % 50 === 1))
    val ch = time("feed plan construct")(t.readChangeFeed(3L, 6L))
    time("feed execute count")(ch.count())
    time("replicate incremental")(ChangeFeed.replicateTo(t, m, Seq("o_orderkey")))
    time("mirror read count")(m.read.count())

    // Heterogeneous-key merge classification (round-14 scoping): N merges
    // with N DISTINCT key sets in one feed range. The former shape folded
    // one whole-feed window pass per key set (O(N) full-feed shuffles);
    // the scoped shape is one merge-row-only pass regardless of N — the
    // 2-merge vs 10-merge execute times should be ~flat.
    import graft.table.MergeOps._
    val keySets = Seq(
      Seq("o_orderkey"),
      Seq("o_orderkey", "o_orderstatus"),
      Seq("o_orderkey", "o_orderpriority"),
      Seq("o_orderkey", "o_totalprice"),
      Seq("o_orderkey", "o_orderstatus", "o_orderpriority"),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice"),
      Seq("o_orderkey", "o_orderpriority", "o_totalprice"),
      Seq("o_orderstatus", "o_orderkey"),
      Seq("o_orderpriority", "o_orderkey"),
      Seq("o_totalprice", "o_orderkey"))
    def heteroMerges(n: Int): (Long, Long) = {
      val from = ChangeFeed.capturedThrough(t) + 1
      keySets.take(n).foreach { ks =>
        val src = t.read.filter($"o_orderkey" % 97 === 1)
          .select(ks.map(col) :+
            (($"o_totalprice" + 1.0).as("__np")): _*)
        t.mergeVectored(src, ks.map(k => k -> k),
          Seq(WhenMatchedUpdate(None,
            Map("o_totalprice" -> ((_, sc) => sc("__np"))))), Nil,
          checkUniqueKeys = false)
      }
      val to = ChangeFeed.capturedThrough(t)
      val t0 = System.nanoTime()
      val ch = t.readChangeFeed(from, to)
      val t1 = System.nanoTime()
      val cnt = ch.count()
      val t2 = System.nanoTime()
      println(f"[probe] hetero-merge n=$n%-2d construct ${(t1-t0)/1e9}%.2f s " +
        f"execute ${(t2-t1)/1e9}%.2f s rows $cnt")
      ((t1 - t0) / 1000000L, (t2 - t1) / 1000000L)
    }
    heteroMerges(2)
    heteroMerges(10)
    spark.stop()
  }
}
