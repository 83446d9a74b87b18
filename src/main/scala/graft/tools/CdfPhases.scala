package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm per-phase census of the k14_cdf_mirror protocol: runs the whole
  * sequence twice (fresh scratch both times), reports the SECOND pass's
  * wall, job count, summed job ms and driver gap per phase. Diagnostic
  * only.
  */
object CdfPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.table._

    val jobs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.currentTimeMillis(),
          j.stageInfos.lastOption.map(si => si.name + " @ " +
            si.details.linesIterator
              .filter(l => l.contains("graft.") && !l.contains("graft.tools"))
              .take(1).mkString).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          jobs.synchronized(
            jobs += ((System.currentTimeMillis() - t0, site)))
        }
    })

    def pass(report: Boolean): Unit = {
      val p = graft.queries.Q.scratch(sfDir, "cdfphases_src")
      val mp = graft.queries.Q.scratch(sfDir, "cdfphases_dst")
      Seq(p, p + "__graft_commits", mp, mp + "__graft_commits")
        .foreach(graft.queries.Q.deleteDir(spark, _))
      val t = MedallionTable(spark, p)
      val m = MedallionTable(spark, mp)
      val o = graft.Tables.orders(spark, sfDir).filter($"o_orderkey" % 4 === 1)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          $"o_orderpriority")
      def ph[T](what: String)(f: => T): T = {
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        val r = f
        val wall = (System.nanoTime() - t0) / 1e6
        Thread.sleep(100)
        if (report) {
          val snap = jobs.synchronized(jobs.toVector)
          println(f"[phase] $what%-24s wall=${wall}%7.0f ms " +
            f"jobs=${snap.size}%3d jobMs=${snap.map(_._1).sum}%6d " +
            f"driverMs=${wall - snap.map(_._1).sum}%7.0f")
          snap.groupBy(_._2).map { case (s, v) => (v.map(_._1).sum, v.size, s) }
            .toSeq.sortBy(-_._1).take(8).foreach { case (ms, n, s) =>
              println(f"[phase]    $ms%6d ms n=$n%-3d ${s.take(100)}")
            }
        }
        r
      }
      ph("overwrite")(t.overwrite(o))
      ph("enable")(t.enableChangeDataFeed())
      ph("bootstrap")(ChangeFeed.replicateTo(t, m, Seq("o_orderkey")))
      ph("append")(t.append(o.filter($"o_orderkey" % 89 === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 40000000L)))
      ph("update1")(t.updateVectored($"o_orderkey" % 30 === 1,
        Map("o_orderpriority" -> lit("M1"))))
      ph("update2")(t.updateVectored($"o_orderkey" % 60 === 1,
        Map("o_orderpriority" -> lit("M2"))))
      ph("delete")(t.deleteVectored($"o_orderkey" % 50 === 1))
      // replicate-incr decomposed: exactly what replicateTo does, via the
      // public surface, so each sub-step gets its own census line
      val keys = Seq("o_orderkey")
      val cur = ph("ri:capturedThrough")(ChangeFeed.capturedThrough(t))
      val ch = ph("ri:read-construct")(
        ChangeFeed.read(t, 3L, cur)
          .filter(col(ChangeFeed.ChangeTypeCol) =!= "update_preimage"))
      val last = ph("ri:net+checkpoint") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(ChangeFeed.CommitVersionCol).desc,
            when(col(ChangeFeed.ChangeTypeCol) === "delete", 0)
              .otherwise(1).desc)
        ch.withColumn("__cf_rn", row_number().over(w))
          .filter(col("__cf_rn") === 1).drop("__cf_rn")
          .drop(ChangeFeed.CommitVersionCol, ChangeFeed.CommitTimestampCol)
          .localCheckpoint()
      }
      val ups = last.filter(col(ChangeFeed.ChangeTypeCol) =!= "delete")
        .drop(ChangeFeed.ChangeTypeCol)
      val dels = last.filter(col(ChangeFeed.ChangeTypeCol) === "delete")
        .select(keys.map(col): _*)
      val cols = m.read.columns.toSeq
      val anyUps = ph("ri:ups-head")(ups.head(1).nonEmpty)
      if (anyUps) ph("ri:mergeVectored")(
        m.mergeVectored(ups, keys.map(k => k -> k),
          Seq(MergeOps.WhenMatchedUpdate(None,
            cols.filterNot(keys.contains).map(c =>
              c -> ((_: MergeOps.ColRef, sc: MergeOps.ColRef) => sc(c))).toMap)),
          Seq(MergeOps.WhenNotMatchedInsert(None,
            cols.map(c =>
              c -> ((_: MergeOps.ColRef, sc: MergeOps.ColRef) => sc(c))).toMap)),
          checkUniqueKeys = false))
      val anyDels = ph("ri:dels-head")(dels.head(1).nonEmpty)
      if (anyDels) ph("ri:deleteVectoredKeys")(m.deleteVectoredKeys(dels, keys))
      ph("ri:watermark")(ChangeFeed.replicateTo(t, m, keys))
      ph("mirror-read-noop")(m.read
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .write.format("noop").mode("overwrite").save())
    }
    pass(report = false)
    println("[phase] ---- warm pass ----")
    pass(report = true)
    spark.stop()
  }
}
