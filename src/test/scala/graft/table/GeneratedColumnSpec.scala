package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated columns ([[MedallionTable.setGeneratedColumn]], Delta
  * GENERATED ALWAYS AS parity): compute-on-write when the incoming frame
  * lacks the column, null-safe-equality invariant when it provides one,
  * registry survival across rewrites/creates/clones, derived-partition
  * pruning, and the declare-on-existing boundary.
  */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  private def base(n: Long = 40L) =
    (0L until n).map(i => (i, java.sql.Date.valueOf(s"199${i % 5}-03-0${i % 9 + 1}")))
      .toDF("id", "d")

  test("missing generated column computes on create/append/merge/update; " +
      "provided values validate") {
    val p = tmpDir("gen")
    val t = MedallionTable(spark, p)
    t.setGeneratedColumn("yr", "year(d)")
    t.overwrite(base()) // lacks yr: computed
    assert(t.read.filter($"yr" =!= year($"d")).count() == 0)
    t.append(base(4).withColumn("id", $"id" + 100L)) // computed again
    assert(t.read.count() == 44 &&
      t.read.filter($"yr" =!= year($"d")).count() == 0)
    // provided and CORRECT: accepted
    t.append(Seq((200L, java.sql.Date.valueOf("1991-01-02"), 1991))
      .toDF("id", "d", "yr"))
    // provided and WRONG: rejected in-pass, nothing lands
    val before = t.read.count()
    intercept[Exception] {
      t.append(Seq((201L, java.sql.Date.valueOf("1991-01-02"), 1999))
        .toDF("id", "d", "yr"))
    }
    assert(t.read.count() == before, "rejected batch must not land")
    // DV update recomputes through enforced(): moving d moves yr… a SET
    // that contradicts the generation is rejected; updating d without
    // providing yr keeps yr consistent via the update projection carrying
    // the OLD yr — so contradictions are caught:
    intercept[Exception] {
      t.updateVectored($"id" === 0L,
        Map("d" -> lit(java.sql.Date.valueOf("2005-07-07"))))
    }
    // updating both consistently passes
    t.updateVectored($"id" === 0L,
      Map("d" -> lit(java.sql.Date.valueOf("2005-07-07")), "yr" -> lit(2005)))
    assert(t.read.filter($"id" === 0L).select("yr").head().getInt(0) == 2005)
  }

  test("registry survives rewrites and clones; SQL DDL round-trips") {
    val p = tmpDir("gen2")
    val t = MedallionTable(spark, p)
    spark.sql(s"ALTER TABLE '$p' ADD GENERATED COLUMN yr AS (year(d))")
    t.overwrite(base())
    t.compact() // rewrite swap replaces _graft_meta
    assert(t.generatedColumns == Map("yr" -> "year(d)"))
    t.append(base(2).withColumn("id", $"id" + 500L))
    assert(t.read.filter($"yr" =!= year($"d")).count() == 0)
    // clone inherits the declaration
    val c = MedallionTable(spark, tmpDir("gen2c"))
    c.cloneFrom(t)
    assert(c.generatedColumns == Map("yr" -> "year(d)"))
    spark.sql(s"ALTER TABLE '$p' DROP GENERATED COLUMN yr")
    assert(t.generatedColumns.isEmpty)
  }

  test("declare-on-existing: matching column accepted, missing or " +
      "violating refused") {
    val t = MedallionTable(spark, tmpDir("gen3"))
    t.overwrite(base().withColumn("yr", year($"d")))
    t.setGeneratedColumn("yr", "year(d)") // matches: accepted
    val t2 = MedallionTable(spark, tmpDir("gen3b"))
    t2.overwrite(base())
    intercept[IllegalArgumentException](
      t2.setGeneratedColumn("yr", "year(d)")) // column absent: refused
    val t3 = MedallionTable(spark, tmpDir("gen3c"))
    t3.overwrite(base().withColumn("yr", lit(1234)))
    intercept[IllegalArgumentException](
      t3.setGeneratedColumn("yr", "year(d)")) // values violate: refused
  }

  test("generated PARTITION column: writers never supply it, scans prune " +
      "on it") {
    val p = tmpDir("gen4")
    val t = MedallionTable(spark, p, partitionColumns = Seq("yr"))
    t.setGeneratedColumn("yr", "year(d)")
    t.overwrite(base()) // yr computed, then used as the partition key
    t.append(base(10).withColumn("id", $"id" + 900L))
    val q = t.read.filter($"yr" === 1993)
    val expected = (base(40) unionByName
      base(10).withColumn("id", $"id" + 900L))
      .filter(year($"d") === 1993).count()
    assert(expected > 0 && q.count() == expected)
    // partition pruning: the scan reads only the yr=1993 directory
    val scanned = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).size
    }.getOrElse(-1)
    val total = t.read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(Nil, Nil).flatMap(_.files).size
    }.getOrElse(-2)
    assert(scanned > 0 && scanned < total,
      s"pruned scan ($scanned files) must read fewer than the full table ($total)")
  }

  test("generation expressions may not reference generated columns — " +
      "declare-time refusal in both directions (Delta's rule)") {
    val t = MedallionTable(spark, tmpDir("genchain"))
    t.setGeneratedColumn("yr", "year(d)")
    // forward chain: new expression references an existing generated col
    val e = intercept[IllegalArgumentException](
      t.setGeneratedColumn("yr2", "yr + 1"))
    assert(e.getMessage.contains("yr") &&
      e.getMessage.contains("non-generated"))
    // self-reference
    intercept[IllegalArgumentException](
      t.setGeneratedColumn("z", "z + 1"))
    // converse chain: an EXISTING generation references the name being
    // declared (pre-fix this resolved or failed by Map hash order)
    val t2 = MedallionTable(spark, tmpDir("genchain2"))
    t2.setGeneratedColumn("b", "a + 1") // a is a plain column here
    val e2 = intercept[IllegalArgumentException](
      t2.setGeneratedColumn("a", "id * 2"))
    assert(e2.getMessage.contains("b"))
    // unrelated second declaration still fine
    t.setGeneratedColumn("mo", "month(d)")
    assert(t.generatedColumns.keySet == Set("yr", "mo"))
  }
}
