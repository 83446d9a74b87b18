package graft.ops

import graft.SparkSpec
import graft.table.MedallionTable
import org.apache.spark.sql.functions._

/** Plan-level evidence for the 100 TB design claims: bucketed co-located
  * joins eliminate the shuffle, and batch-key filters prune hive partitions
  * at the scan (the layout every fact table uses).
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without an Exchange (co-located shuffle-free join)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    // stale managed-table dirs from a previous JVM (in-memory catalog
    // forgets them, the filesystem doesn't)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    graft.queries.Q.deleteDir(spark, s"$wh/graft_bkt_a")
    graft.queries.Q.deleteDir(spark, s"$wh/graft_bkt_b")
    (0 until 10000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    (0 until 10000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 10000)
    }
  }

  test("batch-key filter prunes hive partitions at the scan") {
    import spark.implicits._
    val p = tmpDir("scale_prune")
    val t = MedallionTable(spark, p, partitionColumns = Seq("data_block_id"))
    t.overwrite((0 until 1000).map(i => (i.toLong, i % 4)).toDF("id", "data_block_id"))
    val q = t.read.filter($"data_block_id" === 1)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*data_block_id[^\\]]*\\].*"),
      s"partition filter missing from scan:\n$scan")
    assert(q.collect().length == 250) // executes q's own plan → fills metrics
    // post-execution scan metrics: only pt=1's files were read (1 of 4
    // partitions; the table has 4× as many files in total)
    val allFiles = t.read.inputFiles.length
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    assert(scanned * 4 == allFiles,
      s"expected 1/4 of $allFiles files scanned, got $scanned")
  }

  test("filtered-dim join injects dynamic partition pruning into the fact scan") {
    val df = graft.queries.AdvancedJoinQueries
      .defs("j19_dpp_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition-pruning subquery:\n$plan")
    df.collect() // fill scan metrics with the post-pruning file set
    val allBlocks = 8
    // AQE nests materialized stages in QueryStageExec whose inner plan is
    // a MEMBER, not a child — plain collect/collectLeaves stops at the
    // stage boundary, so recurse through stages to the real scans.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten
    val scanned = scans(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numPartitions").map(_.value)).headOption
    // 3 of 8 partitions survive the dim filter (blk ∈ {0,1,2})
    assert(scanned.contains(3L),
      s"expected 3/$allBlocks partitions after DPP, got $scanned")
  }

  test("flagship wide-table plan keeps broadcast dims and scan pushdown") {
    val df = graft.queries.Flagship.defs("m0_wide_table")(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dims must broadcast, not shuffle:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"unexpected non-equi join:\n$plan")
    assert(plan.contains("PushedFilters: [Is") || plan.contains("PushedFilters: [Gr") ||
      plan.contains("PushedFilters: [Eq") || plan.contains("PushedFilters: [Le"),
      s"filters must reach the parquet scan:\n$plan")
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("decontamination joins on gram hash with the benchmark side broadcast") {
    val df = graft.SparkEntry.queries("text_decontaminate")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast (equi-join on gram md5):\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination must never compare doc x doc:\n$plan")
  }

  test("keeper selection partial-aggregates labels, no cartesian") {
    val df = graft.SparkEntry.queries("dedup_keep_best")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // struct-keyed max_by plans as SortAggregate (not hash-aggregable), but
    // it must still be PARTIAL (map-side combined) — one partial + one
    // final node around the exchange on the group key, linear in labels.
    assert(plan.contains("partial_max_by"),
      s"keeper max_by must be map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in keeper selection:\n$plan")
  }
}
