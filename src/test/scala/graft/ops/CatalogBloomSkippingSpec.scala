package graft.ops

import graft.SparkSpec
import graft.table.{BloomIndex, MedallionTable}
import org.apache.spark.sql.functions._

/** Bloom-index file skipping through the catalog scan, on a table whose
  * files min/max CANNOT prune (ids striped across files by modulus, so
  * every file's [min,max] envelope spans the whole domain): a point
  * lookup opens only the files whose bloom might contain the value,
  * results stay identical to the unpruned read, appends degrade to
  * conservative (kept) instead of wrong, and rewrites drop the index
  * with `_graft_meta`.
  */
class CatalogBloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files, file k holding ids ≡ k (mod 4) over 0..399 — every file's
    * id range is [k, 396+k]: min/max skipping is useless by design.
    */
  private def mkStriped(name: String): String = {
    val p = tmpDir(name)
    val t = new MedallionTable(spark, p)
    t.overwrite((0L until 400L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(4, col("id") % 4))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$p'")
    p
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  test("equality lookup opens only bloom-positive files; results exact") {
    val p = mkStriped("bloom_t")
    val q = "SELECT s FROM bloom_t WHERE id = 123"
    // without an index the scan has no file list to prune
    assert(!planOf(q).contains("GraftPrunedScanRelation"), planOf(q))
    BloomIndex.build(spark, p, "id", expectedItemsPerFile = 1000L)
    // id=123 lives in exactly one stripe; FPs could add a file, never all
    val plan = planOf(q)
    assert(plan.contains("GraftPrunedScanRelation(1 files)") ||
      plan.contains("GraftPrunedScanRelation(2 files)"), plan)
    assert(spark.sql(q).collect().map(_.getString(0)).toSeq == Seq("s123"))
  }

  test("IN-list prunes to the union of matching stripes; absent id to ~0") {
    val p = mkStriped("bloom_in")
    BloomIndex.build(spark, p, "id", expectedItemsPerFile = 1000L)
    // residues 0 and 1 land in 1-2 files (hash partitioning may co-locate
    // them); the point is a strict subset of the 4, never all
    val qin = "SELECT id FROM bloom_in WHERE id IN (8, 9)"
    val planIn = planOf(qin)
    assert((1 to 3).exists(n =>
      planIn.contains(s"GraftPrunedScanRelation($n files)")), planIn)
    assert(spark.sql(qin).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(8L, 9L))
    // a value outside the domain: every file SHOULD test negative
    val qmiss = "SELECT id FROM bloom_in WHERE id = 40000"
    val planMiss = planOf(qmiss)
    assert((0 to 1).exists(n =>
      planMiss.contains(s"GraftPrunedScanRelation($n files)")), planMiss)
    assert(spark.sql(qmiss).count() == 0)
  }

  test("a post-build append is kept conservatively, not missed") {
    val p = mkStriped("bloom_append")
    BloomIndex.build(spark, p, "id", expectedItemsPerFile = 1000L)
    new MedallionTable(spark, p).append(Seq((1000L, "s1000")).toDF("id", "s"))
    val q = "SELECT s FROM bloom_append WHERE id = 1000"
    // the appended file is not in the index → always scanned
    assert(spark.sql(q).collect().map(_.getString(0)).toSeq == Seq("s1000"))
    val planNew = planOf(q)
    assert(planNew.contains("GraftPrunedScanRelation"), planNew)
  }

  test("a rewrite swaps the index away with _graft_meta; lookups still exact") {
    val p = mkStriped("bloom_rw")
    BloomIndex.build(spark, p, "id", expectedItemsPerFile = 1000L)
    assert(BloomIndex.exists(spark, p, "id"))
    new MedallionTable(spark, p)
      .overwrite((0L until 50L).map(i => (i, s"t$i")).toDF("id", "s"))
    assert(!BloomIndex.exists(spark, p, "id"))
    val q = "SELECT s FROM bloom_rw WHERE id = 7"
    assert(!planOf(q).contains("GraftPrunedScanRelation"), planOf(q))
    assert(spark.sql(q).collect().map(_.getString(0)).toSeq == Seq("t7"))
  }
}
