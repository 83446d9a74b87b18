package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-maintenance ≡ full-recompute for [[IncrementalJoin]]: every
  * fact-side CDC class (insert / delete / update, including a join-key
  * move onto a live key and onto a DANGLING key), every dim-side class
  * (value update, key delete, key insert that adopts dangling fact rows,
  * key move), both-sides-in-sequence, and the empty-feed no-op.
  */
class IncrementalJoinSpec extends SparkSpec {

  private val on = Seq("fk" -> "dk")
  private val factKeys = Seq("id")

  private def fact(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "fk", "cents")
  }
  private def dim(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("dk", "name")
  }

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def cdc(old: DataFrame, nw: DataFrame, key: String): DataFrame =
    MergeOps.merge3ClauseCDC(old, nw, Seq(key),
      Some(MergeOps.anyColumnDiffers(old, nw, Seq(key))))

  private def mvOf(f: DataFrame, d: DataFrame): MedallionTable = {
    val mv = MedallionTable(spark, tmpDir("ij_mv"))
    mv.overwrite(IncrementalJoin.fullCompute(f, d, on))
    mv
  }

  test("fact batch: insert/update/delete + key moves ≡ full recompute") {
    val d = dim((10, "x"), (20, "y"))
    val before = fact((1, 10, 100), (2, 20, 200), (3, 10, 300), (4, 20, 400),
      (5, 99, 500)) // id=5 dangling from the start — never materializes
    // id=1 value update; id=2 moves 20→10 (live key); id=3 moves onto a
    // DANGLING key (its view row must vanish); id=4 deleted; id=6 inserts
    // joinable; id=7 inserts dangling (never appears)
    val after = fact((1, 10, 101), (2, 10, 200), (3, 99, 300), (5, 99, 500),
      (6, 20, 600), (7, 98, 700))
    val mv = mvOf(before, d)
    IncrementalJoin.applyFactChanges(mv, cdc(before, after, "id"), d, factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(after, d, on)))
  }

  test("dim batch: update/delete/insert/key-move ≡ full recompute") {
    val f = fact((1, 10, 100), (2, 20, 200), (3, 30, 300), (4, 40, 400),
      (5, 50, 500))
    val before = dim((10, "x"), (20, "y"), (30, "z"), (40, "w"))
    // dk=10 renamed; dk=20 deleted (its fact rows leave the view); dk=50
    // inserted (fact id=5 was dangling, must appear); dk=30 moves to 31
    // (fact id=3 leaves); dk=40 untouched
    val after = dim((10, "x2"), (31, "z"), (40, "w"), (50, "v"))
    val mv = mvOf(f, before)
    IncrementalJoin.applyDimChanges(mv, f, after, cdc(before, after, "dk"),
      factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f, after, on)))
  }

  test("both sides changed, applied in sequence ≡ recompute of final states") {
    val f0 = fact((1, 10, 100), (2, 20, 200), (3, 30, 300))
    val d0 = dim((10, "x"), (20, "y"))
    val f1 = fact((1, 10, 101), (3, 30, 300), (4, 20, 400)) // upd/del/ins
    val d1 = dim((10, "x"), (30, "z"))                      // del 20, ins 30
    val mv = mvOf(f0, d0)
    // causal order: the fact batch lands while the dim is still d0
    IncrementalJoin.applyFactChanges(mv, cdc(f0, f1, "id"), d0, factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f1, d0, on)))
    IncrementalJoin.applyDimChanges(mv, f1, d1, cdc(d0, d1, "dk"), factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f1, d1, on)))
  }

  test("empty feeds are no-ops") {
    val f = fact((1, 10, 100), (2, 20, 200))
    val d = dim((10, "x"), (20, "y"))
    val mv = mvOf(f, d)
    val before = asSet(mv.read)
    IncrementalJoin.applyFactChanges(mv, cdc(f, f, "id"), d, factKeys, on)
    IncrementalJoin.applyDimChanges(mv, f, d, cdc(d, d, "dk"), factKeys, on)
    assert(asSet(mv.read) == before)
  }
}
