package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DV sidecar compaction ([[MedallionTable.compactDv]]): N flat
  * delete-mark files become one deduplicated file with read results
  * identical, committed UPDATE/MERGE witnesses untouched, the crash
  * window harmless by mark idempotence, and the autoCompact janitor
  * triggering on sidecar creep.
  */
class DvCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def seed(): (MedallionTable, String) = {
    val p = tmpDir("dvc")
    val t = MedallionTable(spark, p)
    t.overwrite((0L until 200L).map(i => (i, s"s$i"))
      .toDF("id", "s").repartition(4, col("id")))
    (t, p)
  }

  test("compactDv: N flat files -> 1, deduped, reads identical") {
    val (t, p) = seed()
    // 5 appends, two of them overlapping (ids 0..9 marked twice)
    Seq($"id" < 10, $"id" >= 10 && $"id" < 20, $"id" % 37 === 0,
        $"id" < 10, $"id" === 150L)
      .foreach(t.deleteVectored)
    val before = t.read.orderBy("id").collect().toSeq
    // each append lands >= 1 part file (one per non-empty task)
    val n0 = DeletionVectors.flatMarkFiles(spark, p).size
    assert(n0 >= 5)
    val removed = t.compactDv()
    assert(removed == n0)
    val flats = DeletionVectors.flatMarkFiles(spark, p)
    assert(flats.size == 1)
    assert(t.read.orderBy("id").collect().toSeq == before)
    // deduped: the combined file holds each (file, pos) once
    val combined = spark.read.parquet(flats.head.toString)
    assert(combined.count() == combined.distinct().count())
    // idempotent: a second pass is a no-op
    assert(t.compactDv() == 0)
  }

  test("update-batch witnesses untouched; amended reads survive") {
    val (t, p) = seed()
    t.updateVectored($"id" === 7L, Map("s" -> lit("v2")))
    t.deleteVectored($"id" === 1L)
    t.deleteVectored($"id" === 2L)
    val before = t.read.orderBy("id").collect().toSeq
    val batches = DvUpdates.committedBatches(spark, p)
    assert(batches.nonEmpty)
    t.compactDv()
    assert(DvUpdates.committedBatches(spark, p) == batches,
      "compaction must not touch the update_<batch> visibility witnesses")
    assert(t.read.orderBy("id").collect().toSeq == before)
    assert(t.read.filter($"id" === 7L).select("s").head().getString(0) == "v2")
  }

  test("crash after the combined file lands: harmless superset; recompact heals") {
    val (t, p) = seed()
    t.deleteVectored($"id" < 5)
    t.deleteVectored($"id" >= 195L)
    val n0 = DeletionVectors.flatMarkFiles(spark, p).size
    val before = t.read.orderBy("id").collect().toSeq
    MedallionTable.testFailpoint = {
      case "mid-dv-compact" =>
        MedallionTable.testFailpoint = _ => ()
        throw new RuntimeException("crash between rename and old-file deletes")
      case _ => ()
    }
    try intercept[RuntimeException] { t.compactDv() }
    finally MedallionTable.testFailpoint = _ => ()
    // combined file + the old files all live: duplicates, semantics unchanged
    assert(DeletionVectors.flatMarkFiles(spark, p).size == n0 + 1)
    assert(t.read.orderBy("id").collect().toSeq == before)
    // the staging dir is litter; vacuum enumerates and clears it
    assert(t.vacuumDryRun().exists(_._1.contains("dv_compact_staging")))
    t.vacuum()
    // a re-run compacts the superset back to one file
    assert(t.compactDv() == n0 + 1)
    assert(DeletionVectors.flatMarkFiles(spark, p).size == 1)
    assert(t.read.orderBy("id").collect().toSeq == before)
  }

  test("autoCompact janitors the sidecar past the threshold") {
    val (t, p) = seed()
    (0 until 10).foreach(i => t.deleteVectored($"id" === i.toLong))
    assert(DeletionVectors.flatMarkFiles(spark, p).size > 8)
    assert(t.autoCompact(maxFiles = 8) >= 1)
    assert(DeletionVectors.flatMarkFiles(spark, p).size == 1)
    assert(t.read.count() == 190L)
    // everything now under both thresholds: the janitor is a no-op
    assert(t.autoCompact(maxFiles = 8) == 0)
  }
}
