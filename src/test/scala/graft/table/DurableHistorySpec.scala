package graft.table

import graft.SparkSpec

/** Durable commit journal: markers pruned past
  * [[MedallionTable.HistoryDepth]] are renamed into the journal (then
  * compacted into one tsv), so `DESCRIBE HISTORY` and `TIMESTAMP AS OF`
  * resolve over the table's whole life, not the last 8 commits — the
  * table-side twin of the change feed's capture-manifest durability.
  */
class DurableHistorySpec extends SparkSpec {
  import spark.implicits._

  test("fullHistory returns every commit ever made; history() stays " +
      "bounded at the live window") {
    val t = MedallionTable(spark, tmpDir("dh1"))
    t.overwrite(Seq(0).toDF("x"))
    (1 until 20).foreach(i => t.append(Seq(i).toDF("x")))
    assert(t.history().length == MedallionTable.HistoryDepth)
    val full = t.fullHistory()
    assert(full.map(_._1) == (20L to 1L by -1L),
      s"journal lost ordinals: ${full.map(_._1)}")
    assert(full.last._2 == "create-overwrite")
    assert(full.count(_._2 == "append") == 19)
    // instants stay monotone across the live/journal boundary
    val ts = full.map(_._3)
    assert(ts.zip(ts.tail).forall { case (n, o) => n >= o },
      s"non-monotone across journal boundary: $ts")
  }

  test("journal compaction folds per-ordinal files into one tsv with " +
      "nothing lost; repeated compaction stays idempotent") {
    val prev = MedallionTable.JournalCompactThreshold
    MedallionTable.JournalCompactThreshold = 4
    try {
      val p = tmpDir("dh2")
      val t = MedallionTable(spark, p)
      t.overwrite(Seq(0).toDF("x"))
      (1 until 25).foreach(i => t.append(Seq(i).toDF("x")))
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val journal = new org.apache.hadoop.fs.Path(p + "__graft_commits",
        "journal")
      val loose =
        if (fs.exists(journal)) fs.listStatus(journal).length else 0
      assert(loose <= 4 + 1, s"journal dir not compacted: $loose files")
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        p + "__graft_commits", "journal.tsv")))
      assert(t.fullHistory().map(_._1) == (25L to 1L by -1L))
    } finally MedallionTable.JournalCompactThreshold = prev
  }

  test("DESCRIBE HISTORY and the history TVF render past the live " +
      "window") {
    val p = tmpDir("dh3")
    val t = MedallionTable(spark, p)
    t.overwrite(Seq(0).toDF("x"))
    (1 until 13).foreach(i => t.append(Seq(i).toDF("x")))
    val rows = spark.sql(s"DESCRIBE HISTORY '$p'").collect()
    assert(rows.length == 13)
    assert(rows.map(_.getLong(0)).toSeq == (13L to 1L by -1L))
    val tvf = spark.sql(
      s"SELECT version FROM graft_table_history('$p')").collect()
    assert(tvf.length == 13)
  }

  test("TIMESTAMP AS OF resolves a beyond-depth-8 retained snapshot " +
      "through the journal") {
    val p = tmpDir("dh4")
    // rewrites archive snapshots; retain enough that commit 2's state is
    // still reconstructible after 12 commits push its marker out of the
    // live window and into the journal
    val t = MedallionTable(spark, p, retainVersions = 12)
    t.overwrite(Seq((1L, "v1")).toDF("id", "s"))            // commit 1
    (2 to 12).foreach(i =>                                   // commits 2..12
      t.merge(Seq((1L, s"v$i")).toDF("id", "s"), Seq("id")))
    assert(t.history().map(_._1).min > 2L,
      "commit 2's marker should have been pruned to the journal")
    val at2 = t.fullHistory().find(_._1 == 2L).map(_._3).get
    spark.sql("DROP TABLE IF EXISTS dh4_tt")
    spark.sql(s"CREATE TABLE dh4_tt USING graft LOCATION '$p'")
    try {
      val inst = java.time.Instant.ofEpochMilli(at2)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      val got = spark.sql(
        s"SELECT s FROM dh4_tt TIMESTAMP AS OF '$inst'").head.getString(0)
      assert(got == "v2", s"resolved wrong snapshot: $got")
    } finally spark.sql("DROP TABLE IF EXISTS dh4_tt")
  }

  test("compaction tsv swap is crash-safe: a crash between the park and " +
      "the swap rename reads complete history off the .bak") {
    val prev = MedallionTable.JournalCompactThreshold
    MedallionTable.JournalCompactThreshold = 4
    try {
      val p = tmpDir("dh5")
      val t = MedallionTable(spark, p)
      t.overwrite(Seq(0).toDF("x"))
      (1 until 30).foreach(i => t.append(Seq(i).toDF("x")))
      val full0 = t.fullHistory().map(_._1)
      assert(full0 == (30L to 1L by -1L))
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tsv = new org.apache.hadoop.fs.Path(p + "__graft_commits",
        "journal.tsv")
      val bak = new org.apache.hadoop.fs.Path(p + "__graft_commits",
        "journal.tsv.bak")
      assert(fs.exists(tsv), "precondition: compaction produced the tsv")
      // simulate the crash point INSIDE compactJournal: old tsv parked as
      // .bak, new tsv not yet renamed in — the window writeMetaText's
      // delete-then-rename left unreadable before this fix
      assert(fs.rename(tsv, bak))
      assert(t.fullHistory().map(_._1) == full0,
        "history rows compacted into the parked tsv were lost mid-swap")
      // the next compaction (triggered by more commits) heals the state:
      // merged rows land in a fresh tsv and the .bak is retired
      (30 until 40).foreach(i => t.append(Seq(i).toDF("x")))
      assert(t.fullHistory().map(_._1) == (40L to 1L by -1L))
      assert(fs.exists(tsv), "compaction did not rebuild the tsv")
    } finally MedallionTable.JournalCompactThreshold = prev
  }
}
