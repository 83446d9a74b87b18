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
    spark.stop()
  }
}
