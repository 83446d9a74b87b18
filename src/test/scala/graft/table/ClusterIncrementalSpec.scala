package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental clustering ([[MedallionTable.clusterIncremental]] —
  * Delta liquid-clustering's cost shape): new-data-only z-clustering
  * through the atomic DV-batch commit, content identity across passes,
  * read-pruning parity with a full [[compactZOrder]], crash atomicity,
  * and composition with appends / DV deletes / the materializing
  * OPTIMIZE.
  */
class ClusterIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "v")

  test("N incremental passes match one full compactZOrder: same content, " +
      "comparable range pruning, zero full-table re-sorts") {
    val ti = MedallionTable(spark, tmpDir("ci1"))
    val tf = MedallionTable(spark, tmpDir("ci1f"))
    // identical append streams: 4 unclustered batches of 1000 ids
    (0 until 4).foreach { b =>
      val batch = rows(b * 1000L, b * 1000L + 1000L).repartition(4)
      ti.append(batch); tf.append(batch)
      // incremental table clusters after EVERY batch — the maintenance
      // cadence a 100 TB append stream would run
      assert(ti.clusterIncremental(Seq("id"), nFiles = 4) > 0)
    }
    tf.compactZOrder(Seq("id"), nFiles = 16) // one full re-sort
    // content identity
    assert(ti.read.select(sum($"id"), count(lit(1))).head ==
      tf.read.select(sum($"id"), count(lit(1))).head)
    // a second pass with no new data is a no-op
    assert(ti.clusterIncremental(Seq("id")) == 0)
    // pruning parity: a selective range read touches few files on BOTH
    // layouts (each incremental batch is z-sorted, so per-file ranges
    // stay tight; the manifest covers batch files)
    val pi = ti.readRange("id", 1100, 1299)
    val pf = tf.readRange("id", 1100, 1299)
    assert(pi.collect().map(_.getLong(0)).sorted.toSeq ==
      pf.collect().map(_.getLong(0)).sorted.toSeq)
    val totalI = ti.read.inputFiles.length
    assert(pi.inputFiles.length <= 3,
      s"incremental layout scanned ${pi.inputFiles.length} of $totalI files")
    assert(pf.inputFiles.length <= 3)
  }

  test("absorbed base files are gone; appends keep landing and the next " +
      "pass absorbs only them; OPTIMIZE materializes everything") {
    val p = tmpDir("ci2")
    val t = MedallionTable(spark, p)
    t.append(rows(0, 500).repartition(3))
    assert(t.clusterIncremental(Seq("id"), nFiles = 2) == 3)
    // base dir emptied of data files — the clustered copy lives in the
    // batch; reads union it in
    assert(new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet")) == 0)
    assert(DvUpdates.committedBatches(spark, p).nonEmpty)
    assert(t.read.count() == 500)
    // new appends land in base; the next pass absorbs exactly them
    t.append(rows(500, 600).repartition(2))
    assert(t.read.count() == 600)
    assert(t.clusterIncremental(Seq("id"), nFiles = 1) == 2)
    assert(t.read.count() == 600)
    // the materializing OPTIMIZE folds batches back into the base layout
    t.compact(clusterBy = Seq("id"), nFiles = 4)
    assert(DvUpdates.committedBatches(spark, p).isEmpty)
    assert(t.read.count() == 600)
    assert(t.read.select(sum($"id")).head.getLong(0) ==
      (0L until 600L).sum)
  }

  test("composes with DV deletes: masked rows are not resurrected by " +
      "clustering, and clustering masked-only files just drops them") {
    val t = MedallionTable(spark, tmpDir("ci3"))
    t.append(rows(0, 300).repartition(2))
    t.deleteVectored($"id" < 100)
    assert(t.clusterIncremental(Seq("id"), nFiles = 2) == 2)
    assert(t.read.count() == 200)
    assert(t.read.filter($"id" < 100).count() == 0,
      "clustering resurrected DV-deleted rows")
    // delete EVERYTHING live, then cluster: nothing to stage, files drop,
    // table stays readable (schema stash) and empty
    t.deleteVectored(lit(true))
    assert(t.read.count() == 0)
    assert(t.clusterIncremental(Seq("id")) >= 0)
    assert(t.exists && t.read.count() == 0)
  }

  test("crash before the commit rename leaves the table untouched; " +
      "a crash after it is healed by the idempotent re-run") {
    val p = tmpDir("ci4")
    val t = MedallionTable(spark, p)
    t.append(rows(0, 200).repartition(2))
    case class Boom() extends RuntimeException
    MedallionTable.testFailpoint = {
      case "pre-cluster-commit" => throw Boom()
      case _ => ()
    }
    try intercept[Boom](t.clusterIncremental(Seq("id")))
    finally MedallionTable.testFailpoint = _ => ()
    assert(t.read.count() == 200)
    assert(DvUpdates.committedBatches(spark, p).isEmpty)
    t.vacuum() // clears the orphaned staging
    // crash AFTER the rename, BEFORE the base-file drop: content is
    // already committed once; the re-run absorbs the masked leftovers
    // without duplicating
    MedallionTable.testFailpoint = {
      case "post-cluster-commit" => throw Boom()
      case _ => ()
    }
    try intercept[Boom](t.clusterIncremental(Seq("id")))
    finally MedallionTable.testFailpoint = _ => ()
    assert(t.read.count() == 200, "post-commit crash changed content")
    assert(t.clusterIncremental(Seq("id")) >= 0) // heals
    assert(t.read.count() == 200)
    assert(t.read.select(sum($"id")).head.getLong(0) == (0L until 200L).sum)
  }

  test("partitioned table: clustered batches keep the hive layout and " +
      "partition-pruned reads still work") {
    val t = MedallionTable(spark, tmpDir("ci5"), Seq("g"))
    t.append(rows(0, 400).withColumn("g", ($"id" % 2).cast("int"))
      .repartition(3))
    assert(t.clusterIncremental(Seq("id"), nFiles = 2) > 0)
    assert(t.read.count() == 400)
    assert(t.read.filter($"g" === 1).count() == 200)
  }
}
