package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone: zero-copy, snapshots the source's READ STATE (rows,
  * deletion vector, column map, constraints), takes local writes,
  * materializes-and-decouples on rewrite, and composes with time travel.
  */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(): (MedallionTable, String) = {
    val p = tmpDir("clone_src")
    val t = MedallionTable(spark, p)
    t.overwrite((0L until 100L).map(i => (i, s"s$i", i * 2))
      .toDF("id", "s", "v").repartition(4))
    (t, p)
  }

  private def parquetFiles(p: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(p)).map(_.getPath)
      .filter(f => f.endsWith(".parquet") && !f.contains("_graft_meta"))
  }

  test("clone is zero-copy and reads the source's rows") {
    val (src, _) = mkSource()
    val cp = tmpDir("clone_t1")
    val c = MedallionTable(spark, cp)
    c.cloneFrom(src)
    assert(parquetFiles(cp).isEmpty) // no data bytes copied
    assert(c.read.count() == 100)
    assert(c.read.filter($"id" === 7).select("v").head().getLong(0) == 14L)
  }

  test("read-state metadata travels: vector, rename, constraint") {
    val (src, _) = mkSource()
    src.deleteVectored($"id" >= 90)
    src.renameColumn("v", "score")
    src.addCheckConstraint("id_pos", "id >= 0")
    val cp = tmpDir("clone_t2")
    val c = MedallionTable(spark, cp)
    c.cloneFrom(src)
    assert(c.read.count() == 90)
    assert(c.read.columns.toSeq == Seq("id", "s", "score"))
    intercept[Exception](
      c.append(Seq((-1L, "bad", 0L)).toDF("id", "s", "score")))
    // and the clone's own vectored delete works over pointer files
    c.deleteVectored($"score" < 10)
    assert(c.read.count() == 85)
    assert(src.read.count() == 90) // source untouched by clone writes
  }

  test("local writes land in the clone; source appends are invisible") {
    val (src, _) = mkSource()
    val cp = tmpDir("clone_t3")
    val c = MedallionTable(spark, cp)
    c.cloneFrom(src)
    c.append(Seq((1000L, "x", 0L)).toDF("id", "s", "v"))
    assert(c.read.count() == 101)
    assert(parquetFiles(cp).nonEmpty)
    src.append(Seq((2000L, "y", 0L)).toDF("id", "s", "v"))
    assert(c.read.count() == 101) // the clone pinned the file LIST
    assert(src.read.count() == 101)
  }

  test("OPTIMIZE materializes and decouples from later source rewrites") {
    val (src, _) = mkSource()
    val cp = tmpDir("clone_t4")
    val c = MedallionTable(spark, cp)
    c.cloneFrom(src)
    c.compact(nFiles = 2)
    assert(!ShallowClone.isClone(spark, cp))
    assert(parquetFiles(cp).nonEmpty)
    src.overwrite(Seq((1L, "z", 9L)).toDF("id", "s", "v")) // relocates source files
    assert(c.read.count() == 100) // clone unaffected: it owns its files now
  }

  test("SQL: CREATE TABLE SHALLOW CLONE + catalog read") {
    val (_, sp) = mkSource()
    val cp = tmpDir("clone_t5")
    val n = spark.sql(s"CREATE TABLE '$cp' SHALLOW CLONE '$sp'")
      .head().getLong(1)
    assert(n > 0)
    spark.sql("DROP TABLE IF EXISTS clone_cat")
    spark.sql(s"CREATE TABLE clone_cat USING graft LOCATION '$cp'")
    assert(spark.sql("SELECT COUNT(*) c FROM clone_cat").head().getLong(0) == 100)
    assert(spark.sql("SELECT v FROM clone_cat WHERE id = 3").head().getLong(0) == 6L)
  }

  test("stats manifest over a clone covers pointer files") {
    val (src, _) = mkSource()
    val cp = tmpDir("clone_t6")
    val c = MedallionTable(spark, cp)
    c.cloneFrom(src)
    c.refreshStats()
    val m = TableStats.aggregateFromManifest(spark, cp,
      Seq(TableStats.RowCount, TableStats.ColMax("v")), c.read.schema)
    assert(m.head().getLong(0) == 100L)
    assert(m.head().getLong(1) == 198L)
  }
}
