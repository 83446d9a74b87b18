package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-frame tests for the type-2 SCD merge (MergeOps.scd2Merge):
  * close-and-open on change, passthrough on no-change, new-key open,
  * no-delete on absence, deep history across consecutive merges,
  * idempotent re-apply, and the MedallionTable round trip with commit
  * history. The oracle-checked `k_scd2_merge` covers one merge cycle
  * set-wise; these cover the multi-merge state machine.
  */
class Scd2Spec extends SparkSpec {

  private val D0 = java.sql.Date.valueOf("2024-01-01")
  private val D1 = java.sql.Date.valueOf("2024-02-01")
  private val D2 = java.sql.Date.valueOf("2024-03-01")

  private def snapshot0: DataFrame = {
    import spark.implicits._
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("id", "name", "v")
  }

  private def dim0: DataFrame = MergeOps.scd2Init(snapshot0, lit(D0))

  private def asSet(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  test("init marks every row current with a typed-null valid_to") {
    val d = dim0
    assert(d.schema("valid_to").dataType.typeName == "date")
    assert(asSet(d) == Set(
      Seq(1L, "alice", 10.0, D0, null, true),
      Seq(2L, "bob", 20.0, D0, null, true),
      Seq(3L, "carol", 30.0, D0, null, true)))
  }

  test("change closes the current row and opens the new version") {
    import spark.implicits._
    // id=1 changed, id=2 unchanged, id=3 absent (no delete), id=4 new
    val day1 = Seq((1L, "alice", 11.0), (2L, "bob", 20.0), (4L, "dave", 40.0))
      .toDF("id", "name", "v")
    val out = MergeOps.scd2Merge(dim0, day1, Seq("id"), lit(D1))
    assert(asSet(out) == Set(
      Seq(1L, "alice", 10.0, D0, D1, false), // closed
      Seq(1L, "alice", 11.0, D1, null, true), // opened
      Seq(2L, "bob", 20.0, D0, null, true),   // unchanged passthrough
      Seq(3L, "carol", 30.0, D0, null, true), // absent from source: kept
      Seq(4L, "dave", 40.0, D1, null, true))) // brand-new key
  }

  test("re-applying the same snapshot at a later date is a no-op") {
    import spark.implicits._
    val day1 = Seq((1L, "alice", 11.0)).toDF("id", "name", "v")
    val once = MergeOps.scd2Merge(dim0, day1, Seq("id"), lit(D1))
    val twice = MergeOps.scd2Merge(once, day1, Seq("id"), lit(D2))
    assert(asSet(twice) == asSet(once))
  }

  test("second change deepens history; closed rows never rejoin") {
    import spark.implicits._
    val day1 = Seq((1L, "alice", 11.0)).toDF("id", "name", "v")
    val day2 = Seq((1L, "alice", 12.0)).toDF("id", "name", "v")
    val out = MergeOps.scd2Merge(
      MergeOps.scd2Merge(dim0, day1, Seq("id"), lit(D1)),
      day2, Seq("id"), lit(D2))
    assert(asSet(out.filter($"id" === 1)) == Set(
      Seq(1L, "alice", 10.0, D0, D1, false),
      Seq(1L, "alice", 11.0, D1, D2, false),
      Seq(1L, "alice", 12.0, D2, null, true)))
    // exactly one current row per key, intervals chain without gaps
    val cur = out.filter($"is_current").groupBy($"id").count()
      .filter($"count" > 1)
    assert(cur.isEmpty)
  }

  test("rejects a source carrying SCD2 metadata or wrong business columns") {
    import spark.implicits._
    val withMeta = dim0.select("id", "name", "v", "is_current")
    intercept[IllegalArgumentException] {
      MergeOps.scd2Merge(dim0, withMeta, Seq("id"), lit(D1))
    }
    val missing = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      MergeOps.scd2Merge(dim0, missing, Seq("id"), lit(D1))
    }
  }

  test("null transitions are tracked changes (null-safe default detection)") {
    import spark.implicits._
    // v: 10.0 → NULL for id=1 and NULL → 20.0 for id=2. Under null-unsafe
    // <> both predicates evaluate to NULL and the updates would silently
    // drop (the round-8 advice finding); the null-safe default must close
    // and reopen both keys.
    val s0 = Seq((1L, "alice", Some(10.0)), (2L, "bob", None: Option[Double]))
      .toDF("id", "name", "v")
    val dim = MergeOps.scd2Init(s0, lit(D0))
    val day1 = Seq((1L, "alice", None: Option[Double]), (2L, "bob", Some(20.0)))
      .toDF("id", "name", "v")
    val out = MergeOps.scd2Merge(dim, day1, Seq("id"), lit(D1))
    assert(asSet(out) == Set(
      Seq(1L, "alice", 10.0, D0, D1, false),
      Seq(1L, "alice", null, D1, null, true),
      Seq(2L, "bob", null, D0, D1, false),
      Seq(2L, "bob", 20.0, D1, null, true)))
    // and re-applying the same all-null-bearing snapshot stays a no-op
    assert(asSet(MergeOps.scd2Merge(out, day1, Seq("id"), lit(D2))) == asSet(out))
  }

  test("MedallionTable.scd2Merge rejects a duplicate-keyed snapshot") {
    import spark.implicits._
    val p = tmpDir("scd2_dupkeys")
    val t = MedallionTable(spark, p)
    t.overwrite(dim0)
    val dup = Seq((1L, "alice", 11.0), (1L, "alice", 12.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException] {
      t.scd2Merge(dup, Seq("id"), lit(D1))
    }
    // the failed merge must not have touched the table
    assert(asSet(t.read) == asSet(dim0))
  }

  test("MedallionTable.scd2Merge round trip records the op in history") {
    import spark.implicits._
    val p = tmpDir("scd2_table")
    val t = MedallionTable(spark, p)
    t.overwrite(dim0)
    val day1 = Seq((1L, "alice", 11.0), (4L, "dave", 40.0)).toDF("id", "name", "v")
    t.scd2Merge(day1, Seq("id"), lit(D1))
    assert(asSet(t.read) == Set(
      Seq(1L, "alice", 10.0, D0, D1, false),
      Seq(1L, "alice", 11.0, D1, null, true),
      Seq(2L, "bob", 20.0, D0, null, true),
      Seq(3L, "carol", 30.0, D0, null, true),
      Seq(4L, "dave", 40.0, D1, null, true)))
    assert(t.history().exists(_._2.startsWith("scd2-merge")))
  }
}
