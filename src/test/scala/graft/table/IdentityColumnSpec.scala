package graft.table

import graft.SparkSpec
import graft.table.MergeOps._
import org.apache.spark.sql.functions._

/** Identity columns ([[MedallionTable.setIdentityColumn]], Delta
  * GENERATED ALWAYS AS IDENTITY parity): dense monotone assignment
  * across create/append, ALWAYS refusals (provided values, UPDATE SETs,
  * merge-clause assignments), merge-insert NULL fill on both merge
  * paths, registry/high-water survival across rewrites, declare-on-
  * existing sync, and collision-freedom under concurrent writers.
  */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def ids(t: MedallionTable): Seq[Long] =
    t.read.select("doc_id").as[Long].collect().toSeq.sorted

  test("dense monotone across create/append; ALWAYS refusals; merge " +
      "inserts fill on the DV and rewrite paths; rewrites keep state") {
    val t = MedallionTable(spark, tmpDir("idcol"))
    t.setIdentityColumn("doc_id", start = 10L, step = 2L)
    t.overwrite(Seq("a", "b", "c").toDF("s"))
    assert(ids(t) == Seq(10L, 12L, 14L))
    t.append(Seq("d", "e").toDF("s"))
    assert(ids(t) == Seq(10L, 12L, 14L, 16L, 18L))
    // GENERATED ALWAYS: a provided value refuses, batch does not land
    val e = intercept[IllegalStateException](
      t.append(Seq(("f", 99L)).toDF("s", "doc_id")))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    assert(t.read.count() == 5)
    // UPDATE may not SET it (either path)
    intercept[IllegalStateException](
      t.updateVectored($"s" === "a", Map("doc_id" -> lit(1L))))
    intercept[IllegalStateException](
      t.update($"s" === "a", Map("doc_id" -> lit(1L))))
    // a merge clause may not assign it
    intercept[IllegalStateException](
      t.mergeVectored(Seq(("a", 5L)).toDF("k", "nid"), Seq("s" -> "k"),
        Seq(WhenMatchedUpdate(None,
          Map("doc_id" -> ((_, sc) => sc("nid"))))), Nil))
    // DV merge: matched keeps its id, insert gets the next ids
    t.mergeVectored(Seq("a", "x").toDF("k"), Seq("s" -> "k"),
      Seq(WhenMatchedUpdate(None, Map("s" -> ((_, _) => lit("a2"))))),
      Seq(WhenNotMatchedInsert(None, Map("s" -> ((_, sc) => sc("k"))))))
    assert(ids(t) == Seq(10L, 12L, 14L, 16L, 18L, 20L))
    assert(t.read.filter($"s" === "a2").select("doc_id").as[Long]
      .head() == 10L, "matched row keeps its identity")
    // rewrite-path merge insert fills too (rewriteVia fillIdentityNulls)
    t.mergeClauses(Seq("y").toDF("k"), Seq("s" -> "k"), Nil,
      Seq(WhenNotMatchedInsert(None, Map("s" -> ((_, sc) => sc("k"))))), Nil)
    assert(ids(t) == Seq(10L, 12L, 14L, 16L, 18L, 20L, 22L))
    // rewrites carry registry + high-water (compact swaps _graft_meta)
    t.compact()
    t.append(Seq("z").toDF("s"))
    assert(ids(t) == Seq(10L, 12L, 14L, 16L, 18L, 20L, 22L, 24L))
  }

  test("declare on existing BIGINT column syncs the high-water; " +
      "non-BIGINT and missing-column declares refuse") {
    val t = MedallionTable(spark, tmpDir("idsync"))
    t.overwrite(Seq((100L, "a"), (7L, "b")).toDF("doc_id", "s"))
    t.setIdentityColumn("doc_id")
    t.append(Seq("c", "d").toDF("s"))
    assert(ids(t) == Seq(7L, 100L, 101L, 102L),
      "sync must continue past the existing max")
    val t2 = MedallionTable(spark, tmpDir("idsync2"))
    t2.overwrite(Seq((1, "a")).toDF("i", "s"))
    intercept[IllegalArgumentException](t2.setIdentityColumn("i"))
    intercept[IllegalArgumentException](t2.setIdentityColumn("nope"))
  }

  test("rewrite-path ALWAYS holes closed: overwrite of an existing table " +
      "assigns/refuses like create; 3-clause merge and SCD2 refuse " +
      "identity-carrying sources; re-declare after drop honors START WITH") {
    val t = MedallionTable(spark, tmpDir("idrw"))
    t.setIdentityColumn("doc_id")
    t.overwrite(Seq("a", "b").toDF("s"))
    // overwrite of the EXISTING table: missing → assigned (monotonic
    // past the first epoch), provided → refused
    t.overwrite(Seq("c", "d", "e").toDF("s"))
    assert(ids(t) == Seq(3L, 4L, 5L),
      "second overwrite allocates past the first epoch's high-water")
    intercept[IllegalStateException](
      t.overwrite(Seq(("f", 500L)).toDF("s", "doc_id")))
    // 3-clause merge assigns every source column: identity-carrying
    // sources refuse instead of writing caller ids
    val e = intercept[IllegalStateException](
      t.merge(Seq((99L, "x")).toDF("doc_id", "s"), Seq("doc_id")))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // drop clears the high-water: a re-declare honors START WITH
    t.dropIdentityColumn("doc_id")
    val t2 = MedallionTable(spark, tmpDir("idrw2"))
    t2.setIdentityColumn("seq")
    t2.overwrite(Seq("a").toDF("s")) // hw = 1
    t2.dropIdentityColumn("seq")
    t2.overwrite(Seq(("b", 7L)).toDF("s", "seq")) // hand-managed now
    t2.setIdentityColumn("seq", start = 100L) // re-declare syncs to max=7
    t2.append(Seq("c").toDF("s"))
    assert(t2.read.select("seq").as[Long].collect().toSeq.sorted ==
      Seq(7L, 8L), "re-declare on data syncs from the data, not stale hw")
    // declare on a column with NULLs refuses (the NULL⟺insert induction)
    val t3 = MedallionTable(spark, tmpDir("idrw3"))
    t3.overwrite(Seq((Some(1L), "a"), (None, "b")).toDF("nid", "s"))
    intercept[IllegalArgumentException](t3.setIdentityColumn("nid"))
  }

  test("SQL DDL round-trips: ADD IDENTITY COLUMN ... START WITH/STEP BY, " +
      "DROP IDENTITY COLUMN") {
    val t = MedallionTable(spark, tmpDir("idddl"))
    spark.sql(s"ALTER TABLE '${t.path}' ADD IDENTITY COLUMN doc_id " +
      "START WITH 100 STEP BY 5")
    assert(t.identityColumns == Map("doc_id" -> ((100L, 5L))))
    t.overwrite(Seq("a", "b").toDF("s"))
    assert(ids(t) == Seq(100L, 105L))
    spark.sql(s"ALTER TABLE '${t.path}' DROP IDENTITY COLUMN doc_id")
    assert(t.identityColumns.isEmpty)
    // hand-managed after the drop: a provided value is accepted again
    t.append(Seq(("c", 999L)).toDF("s", "doc_id"))
    assert(ids(t) == Seq(100L, 105L, 999L))
  }

  test("DDL guards: rename/drop of a registered identity column refuse " +
      "with the hatch named; setGeneratedColumn refuses an identity name") {
    val t = MedallionTable(spark, tmpDir("idguards"))
    t.setIdentityColumn("doc_id")
    t.overwrite(Seq("a", "b").toDF("s"))
    // rename would orphan the name-keyed registry: the next append would
    // re-create 'doc_id' alongside the renamed data
    val r = intercept[IllegalArgumentException](
      t.renameColumn("doc_id", "row_key"))
    assert(r.getMessage.contains("dropIdentityColumn"))
    // renaming ONTO a registered identity name refuses (the schema
    // already carries it; the identity guard is defense-in-depth behind)
    intercept[IllegalArgumentException](t.renameColumn("s", "doc_id"))
    // drop would leave the registry resurrecting the column on append
    val d = intercept[IllegalArgumentException](t.dropColumn("doc_id"))
    assert(d.getMessage.contains("dropIdentityColumn"))
    // one column cannot be both IDENTITY and expression-generated
    val g = intercept[IllegalArgumentException](
      t.setGeneratedColumn("doc_id", "length(s)"))
    assert(g.getMessage.contains("IDENTITY"))
    // the hatch works: retire the registry entry, then rename freely
    t.dropIdentityColumn("doc_id")
    t.renameColumn("doc_id", "row_key")
    t.append(Seq("c").toDF("s"))
    assert(t.read.columns.sorted.toSeq == Seq("row_key", "s"),
      "no resurrected identity column after the hatch")
  }

  test("concurrent appends allocate collision-free, dense ranges") {
    val t = MedallionTable(spark, tmpDir("idconc"))
    t.setIdentityColumn("doc_id")
    t.overwrite(Seq("seed").toDF("s"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until 4).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              val mine = MedallionTable(spark, t.path)
              (0 until 3).foreach { b =>
                mine.append((0 until 10).map(i => s"w${w}b${b}r$i").toDF("s"))
              }
            } catch { case x: Throwable => errs.add(x) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(errs.isEmpty, s"concurrent appends must not fail: ${errs.peek()}")
    val all = ids(t)
    assert(all.size == 121 && all.distinct.size == 121,
      "every concurrently-assigned id is unique")
    assert(all == (1L to 121L),
      "no crashes ⇒ no gaps: the union of allocated ranges is dense")
  }
}
