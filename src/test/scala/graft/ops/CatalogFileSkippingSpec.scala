package graft.ops

import graft.SparkSpec
import graft.table.MedallionTable
import org.apache.spark.sql.functions._

/** Manifest-based file skipping through the catalog scan: pushed
  * range/equality predicates prune the file LIST at plan time (the plan
  * names the pruned relation and its surviving file count), results stay
  * identical to the unpruned read, and every disqualifier falls back.
  */
class CatalogFileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def mkClustered(name: String): String = {
    val p = tmpDir(name)
    val t = new MedallionTable(spark, p)
    // 4 range-clustered files over id 0..399 → tight per-file [min,max]
    t.overwrite((0L until 400L).map(i => (i, s"s$i", i / 2.0)).toDF("id", "s", "v")
      .repartitionByRange(4, col("id")))
    t.refreshStats()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$p'")
    p
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  test("timestamp and date range predicates prune via canonical-epoch bounds") {
    val p = tmpDir("fskip_ts")
    val t = new MedallionTable(spark, p)
    // 8 files range-clustered on event time — the 100 TB dominant shape
    val rows = (0 until 800).map { i =>
      (i.toLong,
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(i * 3600L)),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i / 24)))
    }.toDF("id", "ts", "d")
    t.overwrite(rows.repartitionByRange(8, col("ts")))
    t.refreshStats()
    val stats = spark.read.parquet(p + "/_graft_meta/stats")
    assert(stats.columns.contains("min_ts__ts") &&
      stats.columns.contains("min_ts__d"),
      "canonical-epoch bounds missing from the manifest")
    spark.sql("DROP TABLE IF EXISTS fskip_ts")
    spark.sql(s"CREATE TABLE fskip_ts USING graft LOCATION '$p'")
    // one day ≈ 24 of 800 hourly rows → 1 of 8 files
    val q = "SELECT id FROM fskip_ts WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' " +
      "AND ts < TIMESTAMP '2024-01-04 00:00:00'"
    val plan = planOf(q)
    assert(plan.contains("GraftPrunedScanRelation(1 files)"), s"plan:\n$plan")
    assert(spark.sql(q).collect().map(_.getLong(0)).sorted.toSeq ==
      (48L until 72L))
    // DATE column prunes too (epoch-days bounds): day 5 straddles two
    // range-clustered files (100 hourly rows/file ≈ 4.17 days), so the
    // exact answer is 2 of 8 — a strict subset, bounds-tight
    val qd = "SELECT id FROM fskip_ts WHERE d = DATE '2024-01-05'"
    val pland = planOf(qd)
    assert(pland.contains("GraftPrunedScanRelation(2 files)"), s"plan:\n$pland")
    assert(spark.sql(qd).count() == 24L)
    // an impossible time range opens zero files
    assert(planOf("SELECT id FROM fskip_ts WHERE ts > TIMESTAMP '2030-01-01 00:00:00'")
      .contains("GraftPrunedScanRelation(0 files)"))
  }

  test("a selective range predicate opens a strict subset of files") {
    mkClustered("fskip_t")
    val q = "SELECT id, v FROM fskip_t WHERE id >= 50 AND id < 120"
    val plan = planOf(q)
    assert(plan.contains("GraftPrunedScanRelation(2 files)"), s"plan:\n$plan")
    assert(spark.sql(q).collect().map(_.getLong(0)).sorted.toSeq ==
      (50L until 120L))
  }

  test("an impossible predicate prunes to zero files and zero rows") {
    mkClustered("fskip_zero")
    val q = "SELECT id FROM fskip_zero WHERE id > 5000"
    assert(planOf(q).contains("GraftPrunedScanRelation(0 files)"))
    assert(spark.sql(q).count() == 0)
  }

  test("IN-list envelope and equality prune; no manifest means no pruning") {
    mkClustered("fskip_in")
    val qin = "SELECT id FROM fskip_in WHERE id IN (10, 30, 55)"
    assert(planOf(qin).contains("GraftPrunedScanRelation(1 files)"))
    assert(spark.sql(qin).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 30L, 55L))
    val qeq = "SELECT s FROM fskip_in WHERE id = 399"
    assert(planOf(qeq).contains("GraftPrunedScanRelation(1 files)"))
    assert(spark.sql(qeq).collect().map(_.getString(0)).toSeq == Seq("s399"))
    // an append maintains the manifest incrementally: pruning stays armed,
    // the new file is statted, and a range hitting ONLY it opens 1 of 5
    val p = mkClustered("fskip_stale")
    new MedallionTable(spark, p)
      .append(Seq((1000L, "s1000", 0.5)).toDF("id", "s", "v"))
    val q = "SELECT id FROM fskip_stale WHERE id >= 900"
    assert(planOf(q).contains("GraftPrunedScanRelation(1 files)"), planOf(q))
    assert(spark.sql(q).collect().map(_.getLong(0)).toSeq == Seq(1000L))
  }

  test("string ranges prune in Spark's ordering; doubles prune numerically") {
    mkClustered("fskip_types")
    // v = id/2.0 → file ranges [0,49.5][50,99.5][100,149.5][150,199.5]
    val qv = "SELECT v FROM fskip_types WHERE v >= 150.0"
    assert(planOf(qv).contains("GraftPrunedScanRelation(1 files)"))
    assert(spark.sql(qv).count() == 100)
    // string bounds compare inside Spark (UTF-8 order) — correctness only,
    // the s-values' lexicographic order doesn't follow the id clustering
    val qs = "SELECT s FROM fskip_types WHERE s = 's123'"
    assert(spark.sql(qs).collect().map(_.getString(0)).toSeq == Seq("s123"))
  }

  test("a partial manifest (FOR COLUMNS) never breaks filters on uncovered columns") {
    val p = mkClustered("fskip_partial")
    // Re-analyze covering ONLY v: id/s bounds are now absent from the
    // manifest schema. Filters on them must run (unpruned-by-id) rather
    // than reference min_num__id and fail to resolve.
    spark.sql("ANALYZE TABLE fskip_partial COMPUTE STATISTICS FOR COLUMNS v")
    assert(!graft.table.TableStats.coveredColumns(spark, p).contains("id"))
    val qId = "SELECT id FROM fskip_partial WHERE id > 390"
    assert(spark.sql(qId).collect().map(_.getLong(0)).sorted.toSeq ==
      (391L until 400L))
    // the covered column still prunes
    val qv = "SELECT v FROM fskip_partial WHERE v >= 150.0"
    assert(planOf(qv).contains("GraftPrunedScanRelation(1 files)"), planOf(qv))
    assert(spark.sql(qv).count() == 100)
    // mixed: covered v prunes, uncovered id passes through conservatively
    val qm = "SELECT id FROM fskip_partial WHERE v >= 150.0 AND id < 320"
    assert(spark.sql(qm).collect().map(_.getLong(0)).sorted.toSeq ==
      (300L until 320L))
  }

  test("a DataFrame created before an append sees the appended rows at first action") {
    val p = mkClustered("fskip_replan")
    // created (analyzed) pre-append but NOT physically planned: the
    // pruned file list must resolve at first action, like the fallback
    // path's table read does — not at DataFrame-creation time
    val df = spark.sql("SELECT id FROM fskip_replan WHERE id >= 390")
    new MedallionTable(spark, p)
      .append(Seq((1000L, "s1000", 0.5)).toDF("id", "s", "v"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      ((390L until 400L) :+ 1000L))
    // Once physically planned, BOTH paths pin their input snapshot —
    // standard Spark semantics (FileSourceScanExec does the same); the
    // symmetry, not live re-resolution, is the contract.
    assert(df.queryExecution.executedPlan.toString
      .contains("GraftPrunedScanRelation"))
  }
}
