package graft.table

import graft.SparkSpec

/** Data skipping + compaction: a clustered table's manifest prunes the file
  * set for selective range reads, results stay identical to the full
  * filter, and the manifest survives table reads untouched.
  */
class TableStatsSpec extends SparkSpec {

  test("compact clusters files; readRange skips files and matches full filter") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("stats"))
    t.overwrite((0 until 10000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(8)) // unclustered: every file spans the id range
    t.compact(clusterBy = Seq("id"), nFiles = 8) // range-clustered rewrite
    t.refreshStats()

    val pruned = t.readRange("id", 100, 400)
    val expected = t.read.filter($"id" >= 100 && $"id" <= 400)
      .collect().map(_.getLong(0)).sorted
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == expected.toSeq)

    // selective range over clustered files: far fewer than 8 files touched
    val touched = pruned.inputFiles.length
    assert(touched <= 2, s"expected <=2 clustered files, scanned $touched of 8")
    assert(t.read.inputFiles.length == 8)
  }

  test("string-range skipping works and missing manifest falls back gracefully") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("stats_str"))
    t.overwrite((0 until 1000).map(i => (i.toLong, f"k$i%04d")).toDF("id", "s"))
    // no stats yet — falls back to plain filter
    assert(t.readRange("s", "k0100", "k0199").count() == 100)
    t.compact(clusterBy = Seq("s"), nFiles = 4)
    t.refreshStats()
    val pruned = t.readRange("s", "k0100", "k0199")
    assert(pruned.count() == 100)
    assert(pruned.inputFiles.length <= 2)
  }

  test("manifest dir is invisible to normal reads and exists()") {
    import spark.implicits._
    val t = MedallionTable(spark, tmpDir("stats_vis"))
    t.overwrite(Seq((1L, "a")).toDF("id", "s"))
    t.refreshStats()
    assert(t.read.columns.toSeq == Seq("id", "s"))
    assert(t.read.count() == 1)
    assert(t.exists)
  }
}
