package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-maintenance ≡ full-recompute for [[IncrementalAgg]]: every CDC
  * change class (insert / delete / update pre+post, including a GROUP-KEY
  * move), group vanish, NULL group keys, and the empty-feed no-op.
  */
class IncrementalAggSpec extends SparkSpec {

  private val grp = Seq("g")
  private val sums = Seq("cents" -> col("cents"))

  private def fact(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "g", "cents")
  }

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** CDC feed for old → new keyed by id (the same diff shape
    * MedallionTable.changesSince produces).
    */
  private def cdc(old: DataFrame, nw: DataFrame): DataFrame =
    MergeOps.merge3ClauseCDC(old, nw, Seq("id"),
      Some(MergeOps.anyColumnDiffers(old, nw, Seq("id"))))

  test("refresh over a mixed batch ≡ full recompute (incl. group-key move)") {
    val before = fact((1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40))
    // id=1 value update in place; id=3 MOVES group b→a; id=4 deleted;
    // id=5 inserted into c; id=2 untouched
    val after = fact((1, "a", 11), (2, "a", 20), (3, "a", 30), (5, "c", 50))
    val gold0 = IncrementalAgg.fullCompute(before, grp, sums)
    val gold1 = IncrementalAgg.refresh(gold0, cdc(before, after), grp, sums)
    assert(asSet(gold1) == asSet(IncrementalAgg.fullCompute(after, grp, sums)))
    assert(asSet(gold1) == Set(Seq("a", 3L, 61L), Seq("c", 1L, 50L)))
  }

  test("a group whose last row is deleted disappears, as in a recompute") {
    val before = fact((1, "a", 10), (2, "b", 20))
    val after = fact((1, "a", 10))
    val gold1 = IncrementalAgg.refresh(
      IncrementalAgg.fullCompute(before, grp, sums),
      cdc(before, after), grp, sums)
    assert(asSet(gold1) == Set(Seq("a", 1L, 10L)))
  }

  test("NULL group keys pair null-safely instead of double-counting") {
    import spark.implicits._
    val before = Seq((1L, Option.empty[String], 10L), (2L, Some("a"), 20L))
      .toDF("id", "g", "cents")
    val after = Seq((1L, Option.empty[String], 10L), (2L, Some("a"), 20L),
      (3L, Option.empty[String], 5L)).toDF("id", "g", "cents")
    val gold1 = IncrementalAgg.refresh(
      IncrementalAgg.fullCompute(before, grp, sums),
      cdc(before, after), grp, sums)
    assert(asSet(gold1) == asSet(IncrementalAgg.fullCompute(after, grp, sums)))
    assert(asSet(gold1) == Set(Seq(null, 2L, 15L), Seq("a", 1L, 20L)))
  }

  test("empty change feed leaves the gold bit-identical") {
    val before = fact((1, "a", 10), (2, "b", 20))
    val gold0 = IncrementalAgg.fullCompute(before, grp, sums)
    val gold1 = IncrementalAgg.refresh(gold0, cdc(before, before), grp, sums)
    assert(asSet(gold1) == asSet(gold0))
  }

  test("chained refreshes across two batches ≡ one recompute at the end") {
    val v0 = fact((1, "a", 10), (2, "b", 20), (3, "b", 30))
    val v1 = fact((1, "a", 12), (2, "b", 20), (4, "c", 40))
    val v2 = fact((2, "a", 25), (4, "c", 40), (5, "c", 50))
    val gold = IncrementalAgg.refresh(
      IncrementalAgg.refresh(IncrementalAgg.fullCompute(v0, grp, sums),
        cdc(v0, v1), grp, sums),
      cdc(v1, v2), grp, sums)
    assert(asSet(gold) == asSet(IncrementalAgg.fullCompute(v2, grp, sums)))
  }

  test("unknown _change_type fails the refresh instead of skewing sums") {
    import spark.implicits._
    val gold0 = IncrementalAgg.fullCompute(fact((1, "a", 10)), grp, sums)
    val bad = Seq((9L, "a", 1L, "upsert")).toDF("id", "g", "cents", "_change_type")
    val ex = intercept[Exception] {
      IncrementalAgg.refresh(gold0, bad, grp, sums).collect()
    }
    assert(ex.getMessage.contains("unknown _change_type") ||
      ex.getCause != null)
  }
}
