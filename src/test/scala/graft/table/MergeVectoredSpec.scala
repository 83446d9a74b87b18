package graft.table

import graft.SparkSpec
import graft.table.MergeOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DV-backed MERGE ([[MedallionTable.mergeVectored]]): semantics pinned
  * against the rewrite path ([[MedallionTable.mergeClauses]]) on the same
  * inputs, zero base data files touched, one atomic commit rename (crash
  * window driven with the failpoint), the insert-only / delete-only
  * degenerate shapes, and the SQL `MERGE INTO` routing under
  * `spark.graft.dvWrites`.
  */
class MergeVectoredSpec extends SparkSpec {
  import spark.implicits._

  private def seed(parts: Seq[String] = Nil): (MedallionTable, String) = {
    val p = tmpDir("mdv")
    val t = MedallionTable(spark, p, partitionColumns = parts)
    t.overwrite((0L until 100L).map(i => (i, s"s$i", i % 4, i * 10.0))
      .toDF("id", "s", "grp", "v").repartition(4, col("id")))
    (t, p)
  }

  private def source: DataFrame =
    // ids 90..109: 90..99 match, 100..109 don't; odd ids flagged del
    (90L until 110L).map(i => (i, s"src$i", i % 2 == 1)).toDF("id", "snew", "del")

  private val clauses = (
    Seq[WhenClause](
      WhenMatchedDelete(Some((t, s) => s("del"))),
      WhenMatchedUpdate(Some((t, s) => t("v") >= 920.0),
        Map("s" -> ((t, s) => s("snew")), "v" -> ((t, s) => t("v") + 1.0)))),
    Seq(WhenNotMatchedInsert(Some((t, s) => !s("del")),
      Map("id" -> ((t, s) => s("id")), "s" -> ((t, s) => s("snew")),
          "grp" -> ((t, s) => s("id") % 4), "v" -> ((t, s) => lit(-1.0))))))

  private def dataFiles(p: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(p))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getPath.contains("_graft_meta"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  private def snap(t: MedallionTable): Seq[(Long, String, Long, Double)] =
    // cast: hive partition-value inference types a partitioned grp as int
    t.read.select($"id", $"s", $"grp".cast("long").as("grp"), $"v")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("mergeVectored ≡ mergeClauses rewrite; zero base files touched") {
    val (tv, pv) = seed()
    val (tr, _) = seed()
    val (m, nm) = clauses
    val before = dataFiles(pv)
    tv.mergeVectored(source, Seq("id" -> "id"), m, nm)
    tr.mergeClauses(source, Seq("id" -> "id"), m, nm, Nil)
    assert(dataFiles(pv) == before, "vectored merge rewrites no base file")
    assert(snap(tv) == snap(tr), "vectored ≡ rewrite on the same inputs")
    // spot semantics: 91..99 odd deleted, 92..98 even updated (v>=920),
    // 90 matched-but-no-clause untouched, 100..108 even inserted
    assert(tv.read.filter($"id" === 91L).count() == 0L)
    assert(tv.read.filter($"id" === 92L).select("s", "v").head() ==
      org.apache.spark.sql.Row("src92", 921.0))
    assert(tv.read.filter($"id" === 90L).select("s").head().getString(0) == "s90")
    assert(tv.read.filter($"id" === 100L).select("s", "v").head() ==
      org.apache.spark.sql.Row("src100", -1.0))
    assert(tv.read.filter($"id" === 101L).count() == 0L, "del-flagged not inserted")
  }

  test("insert-only and delete-only shapes commit atomically") {
    val (t, p) = seed()
    val before = dataFiles(p)
    // insert-only: no matched clause at all, zero marks committed
    t.mergeVectored(Seq((500L, "new", false)).toDF("id", "snew", "del"),
      Seq("id" -> "id"), Nil,
      Seq(WhenNotMatchedInsert(None, Map(
        "id" -> ((_, s) => s("id")), "s" -> ((_, s) => s("snew")),
        "grp" -> ((_, _) => lit(0L)), "v" -> ((_, _) => lit(0.0))))))
    assert(t.read.count() == 101L)
    assert(t.read.filter($"id" === 500L).select("s").head().getString(0) == "new")
    // delete-only: empty staged batch, marks carry the whole merge
    t.mergeVectored(Seq(Tuple1(500L)).toDF("id"), Seq("id" -> "id"),
      Seq(WhenMatchedDelete(None)), Nil)
    assert(t.read.count() == 100L)
    assert(t.read.filter($"id" === 500L).count() == 0L)
    assert(dataFiles(p) == before, "both degenerate shapes touch no base file")
    // no-op merge (nothing matches, nothing inserts) leaves no batch
    val batches = DvUpdates.committedBatches(spark, p).size
    t.mergeVectored(Seq(Tuple1(9999L)).toDF("id"), Seq("id" -> "id"),
      Seq(WhenMatchedDelete(None)), Nil)
    assert(DvUpdates.committedBatches(spark, p).size == batches)
  }

  test("duplicate source keys refused (Delta parity); unique check skippable") {
    val (t, _) = seed()
    val dup = Seq((1L, "a", false), (1L, "b", false)).toDF("id", "snew", "del")
    val (m, nm) = clauses
    intercept[IllegalArgumentException] {
      t.mergeVectored(dup, Seq("id" -> "id"), m, nm)
    }
  }

  test("crash before the commit rename: old state intact; vacuum heals; retry wins") {
    val (t, p) = seed()
    val before = snap(t)
    val (m, nm) = clauses
    MedallionTable.testFailpoint = {
      case "pre-merge-dv-commit" =>
        MedallionTable.testFailpoint = _ => ()
        throw new RuntimeException("crash before the atomic commit")
      case _ => ()
    }
    try intercept[RuntimeException] {
      t.mergeVectored(source, Seq("id" -> "id"), m, nm)
    } finally MedallionTable.testFailpoint = _ => ()
    assert(snap(t) == before, "staged batch + marks invisible pre-commit")
    assert(DvUpdates.committedBatches(spark, p).isEmpty)
    t.vacuum()
    assert(DvUpdates.orphans(spark, p).isEmpty)
    t.mergeVectored(source, Seq("id" -> "id"), m, nm)
    assert(t.read.filter($"id" === 100L).count() == 1L)
  }

  test("composes over prior DV ops; OPTIMIZE materializes everything") {
    val (t, p) = seed(parts = Seq("grp"))
    t.updateVectored($"id" === 95L, Map("v" -> lit(5000.0)))
    t.deleteVectored($"id" === 97L)
    val (m, nm) = clauses
    t.mergeVectored(source, Seq("id" -> "id"), m, nm)
    // 95 was amended to v=5000 >= 920 → update clause applies over the
    // AMENDED version but 95 is odd → delete clause (first) wins
    assert(t.read.filter($"id" === 95L).count() == 0L)
    // 97 already deleted: merge can't resurrect it (not matched → but
    // del=true suppresses the insert clause)
    assert(t.read.filter($"id" === 97L).count() == 0L)
    assert(t.read.filter($"id" === 96L).select("s").head().getString(0) ==
      "src96")
    val expected = snap(t)
    t.compact(nFiles = 2)
    assert(DvUpdates.committedBatches(spark, p).isEmpty)
    assert(!DeletionVectors.exists(spark, DeletionVectors.dir(p)))
    assert(snap(t) == expected, "materialization is result-identical")
  }

  test("partition-keyed merge prunes the table pass to touched partitions") {
    val (t, _) = seed(parts = Seq("grp"))
    // source keyed on (grp, id): touches partitions 0 and 1 only
    val src = Seq((0L, 0L, "z0"), (1L, 5L, "z5"), (0L, 888L, "znew"))
      .toDF("g", "i", "snew")
    t.mergeVectored(src, Seq("grp" -> "g", "id" -> "i"),
      Seq(WhenMatchedUpdate(None, Map("s" -> ((_, s) => s("snew"))))),
      Seq(WhenNotMatchedInsert(None, Map(
        "id" -> ((_, s) => s("i")), "s" -> ((_, s) => s("snew")),
        "grp" -> ((_, s) => s("g")), "v" -> ((_, _) => lit(-1.0))))))
    val f = MedallionTable.lastMergeDvPartitionFilter
    assert(f.isDefined && f.get("grp").toSet == Set(0L, 1L),
      s"derived partition filter: $f")
    assert(t.read.filter($"id" === 0L).select("s").head().getString(0) == "z0")
    assert(t.read.filter($"id" === 5L).select("s").head().getString(0) == "z5")
    assert(t.read.filter($"id" === 888L).count() == 1L)
    assert(t.read.count() == 101L)
    // untouched partitions unaffected
    assert(t.read.filter($"grp" === 2L && $"s".startsWith("z")).count() == 0L)
    // the derived isin shape partition-prunes this hive layout — tie the
    // seam to the actual Catalyst behavior
    val plan = t.read.filter($"grp".isInCollection(Seq(0, 1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"),
      s"expected partition filters in:\n$plan")
    // a merge with NO partition key derives no filter
    t.mergeVectored(Seq((3L, "w")).toDF("i", "snew"), Seq("id" -> "i"),
      Seq(WhenMatchedUpdate(None, Map("s" -> ((_, s) => s("snew"))))), Nil)
    assert(MedallionTable.lastMergeDvPartitionFilter.isEmpty)
    assert(t.read.filter($"id" === 3L).select("s").head().getString(0) == "w")
  }

  test("SQL MERGE routes through the DV path under spark.graft.dvWrites") {
    val (t, p) = seed()
    spark.sql("DROP TABLE IF EXISTS mdv_sql")
    spark.sql(s"CREATE TABLE mdv_sql USING graft LOCATION '$p'")
    source.createOrReplaceTempView("mdv_src")
    val before = dataFiles(p)
    spark.conf.set("spark.graft.dvWrites", "true")
    try spark.sql("""
      |MERGE INTO mdv_sql g USING mdv_src s ON g.id = s.id
      |WHEN MATCHED AND s.del THEN DELETE
      |WHEN MATCHED AND g.v >= 920.0 THEN UPDATE SET s = s.snew, v = g.v + 1.0
      |WHEN NOT MATCHED AND NOT s.del THEN
      |  INSERT (id, s, grp, v) VALUES (s.id, s.snew, s.id % 4, -1.0)
      |""".stripMargin)
    finally spark.conf.unset("spark.graft.dvWrites")
    assert(dataFiles(p) == before, "DV-routed SQL MERGE rewrites nothing")
    assert(DvUpdates.committedBatches(spark, p).nonEmpty)
    assert(spark.sql("SELECT s FROM mdv_sql WHERE id = 92").head()
      .getString(0) == "src92")
    assert(spark.sql("SELECT COUNT(*) c FROM mdv_sql WHERE id = 91").head()
      .getLong(0) == 0L)
    // round 16: a by-source statement rides the DV path under the flag
    // too — still zero base files rewritten, the delete lands as marks
    val before2 = dataFiles(p)
    spark.conf.set("spark.graft.dvWrites", "true")
    try spark.sql("""
      |MERGE INTO mdv_sql g USING mdv_src s ON g.id = s.id
      |WHEN MATCHED THEN UPDATE SET s = s.snew
      |WHEN NOT MATCHED BY SOURCE AND g.id = 0 THEN DELETE
      |""".stripMargin)
    finally spark.conf.unset("spark.graft.dvWrites")
    assert(dataFiles(p) == before2,
      "the by-source merge must stay on the DV path (no rewrite)")
    assert(spark.sql("SELECT COUNT(*) c FROM mdv_sql WHERE id = 0").head()
      .getLong(0) == 0L)
    assert(spark.sql("SELECT s FROM mdv_sql WHERE id = 90").head()
      .getString(0) == "src90")
  }

  test("SQL MERGE under dvWrites falls back to the rewrite path when " +
      "broadcasts are disabled; dvMergeMaxSourceBytes restores the DV route") {
    // mergeVectored force-broadcasts its source — when the user DISABLED
    // broadcasts (threshold <= 0, the they-OOM'd configuration) the
    // forced one must not stand. Same statement, same results, different
    // physical route, visible through the committed-batch sidecar.
    val (_, p) = seed()
    spark.sql("DROP TABLE IF EXISTS mdv_nobc")
    spark.sql(s"CREATE TABLE mdv_nobc USING graft LOCATION '$p'")
    source.createOrReplaceTempView("mdv_nobc_src")
    def stmt(deleteCond: String) = s"""
      |MERGE INTO mdv_nobc g USING mdv_nobc_src s ON g.id = s.id
      |WHEN MATCHED AND $deleteCond THEN DELETE
      |WHEN NOT MATCHED AND NOT s.del THEN
      |  INSERT (id, s, grp, v) VALUES (s.id, s.snew, s.id % 4, -1.0)
      |""".stripMargin
    spark.conf.set("spark.graft.dvWrites", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try spark.sql(stmt("s.del AND s.id = 91"))
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.dvWrites")
    }
    assert(DvUpdates.committedBatches(spark, p).isEmpty,
      "broadcasts disabled: the merge must take the rewrite path, not DV")
    assert(spark.sql("SELECT COUNT(*) c FROM mdv_nobc WHERE id = 91").head()
      .getLong(0) == 0L, "the rewrite-path merge must still apply")
    assert(spark.sql("SELECT v FROM mdv_nobc WHERE id = 100").head()
      .getDouble(0) == -1.0)
    // the dedicated cap re-arms the DV route independently of join
    // planning (second merge: the delete of id=93 lands as marks)
    spark.conf.set("spark.graft.dvWrites", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.dvMergeMaxSourceBytes", (64L << 20).toString)
    try spark.sql(stmt("s.del AND s.id = 93"))
    finally {
      spark.conf.unset("spark.graft.dvMergeMaxSourceBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.graft.dvWrites")
    }
    assert(DvUpdates.committedBatches(spark, p).nonEmpty,
      "dvMergeMaxSourceBytes must restore the DV route")
    assert(spark.sql("SELECT COUNT(*) c FROM mdv_nobc WHERE id = 93").head()
      .getLong(0) == 0L)
  }

  test("by-source clauses ride the DV path: ≡ mergeClauses rewrite on " +
      "the same inputs, zero base files touched") {
    val (tv, pv) = seed()
    val (tr, _) = seed()
    val (m, nm) = clauses
    val bySource = Seq[WhenClause](
      WhenNotMatchedBySourceUpdate(Some((t, _) => t("id") % 10 === 7),
        Map("s" -> ((_, _) => lit("stale")),
          "v" -> ((t, _) => t("v") * 2))),
      WhenNotMatchedBySourceDelete(Some((t, _) => t("id") < 20)))
    val before = dataFiles(pv)
    tv.mergeVectored(source, Seq("id" -> "id"), m, nm, bySource)
    tr.mergeClauses(source, Seq("id" -> "id"), m, nm, bySource)
    assert(dataFiles(pv) == before, "by-source DV merge rewrites no base file")
    assert(snap(tv) == snap(tr), "by-source vectored ≡ rewrite")
    // spot semantics: unmatched 7 -> by-source UPDATE (s=stale, v=140);
    // unmatched 5 (<20, no update clause) -> by-source DELETE; 17 takes
    // the FIRST applying clause (update, not the delete); 25 untouched;
    // matched rows behave exactly as the no-by-source merge
    assert(tv.read.filter($"id" === 7L).select("s", "v").head() ==
      org.apache.spark.sql.Row("stale", 140.0))
    assert(tv.read.filter($"id" === 5L).count() == 0L)
    assert(tv.read.filter($"id" === 17L).select("s").head().getString(0)
      == "stale")
    assert(tv.read.filter($"id" === 25L).select("s").head().getString(0)
      == "s25")
    assert(tv.read.filter($"id" === 91L).count() == 0L)
    assert(tv.read.filter($"id" === 90L).select("s").head().getString(0)
      == "s90")
  }

  test("by-source merges disable partition and key-range pushdown — " +
      "both would prune exactly the row class the clauses act on") {
    // key-range: id 33 sits far below the source's [90, 109] key range;
    // range pushdown would drop its file from the scan and the by-source
    // delete would silently miss it
    val (t, _) = seed()
    val (m, nm) = clauses
    t.mergeVectored(source, Seq("id" -> "id"), m, nm,
      Seq(WhenNotMatchedBySourceDelete(Some((tc, _) => tc("id") === 33L))))
    assert(MedallionTable.lastMergeDvRangeFilter.isEmpty,
      "key-range pushdown must be off for by-source merges")
    assert(t.read.filter($"id" === 33L).count() == 0L,
      "by-source delete missed a row outside the source key range")
    // partition: source carries only grp 0, target row 33 lives in grp 1
    val (tp, _) = seed(Seq("grp"))
    tp.mergeVectored(source.withColumn("g", lit(0L)),
      Seq("grp" -> "g", "id" -> "id"), m, nm,
      Seq(WhenNotMatchedBySourceDelete(Some((tc, _) => tc("id") === 33L))))
    assert(MedallionTable.lastMergeDvPartitionFilter.isEmpty,
      "partition pushdown must be off for by-source merges")
    assert(tp.read.filter($"id" === 33L).count() == 0L,
      "by-source delete missed a row in a partition the source never names")
  }

  test("schema-evolving assignments refuse fail-stop on BOTH clause " +
      "paths; the ADD COLUMN hatch then lands the same DV merge") {
    val (t, _) = seed()
    val src = Seq((1L, "web"), (500L, "api")).toDF("k", "ch")
    def evoMerge(): Unit = t.mergeVectored(src, Seq("id" -> "k"),
      Seq(WhenMatchedUpdate(None,
        Map("channel" -> ((_, sc) => sc("ch"))))),
      Seq(WhenNotMatchedInsert(None, Map(
        "id" -> ((_, sc) => sc("k")),
        "channel" -> ((_, sc) => sc("ch"))))))
    // pre-fix both paths silently DROPPED the unknown assignment —
    // diverging from the evolving 3-clause rewrite
    val e = intercept[IllegalStateException](evoMerge())
    assert(e.getMessage.contains("channel") &&
      e.getMessage.contains("ADD COLUMN"))
    val e2 = intercept[IllegalStateException](
      t.mergeClauses(src, Seq("id" -> "k"),
        Seq(WhenMatchedUpdate(None,
          Map("channel" -> ((_, sc) => sc("ch"))))), Nil, Nil))
    assert(e2.getMessage.contains("channel"))
    // the hatch: widen first, then the SAME DV merge lands — matched row
    // updated, new key inserted, untouched rows read typed NULL
    t.addColumn("channel", "string")
    evoMerge()
    val got = t.read.filter($"id".isin(1L, 2L, 500L))
      .select("id", "channel").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("web"), 2L -> None, 500L -> Some("api")))
  }
}
