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

  // column-order-insensitive (hive partition columns read back LAST)
  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
      .collect().map(_.toSeq).toSet

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

  test("partitioned view: pruned repair (merge + DV removals) ≡ recompute") {
    import spark.implicits._
    def factP(rows: (Long, Long, Long)*): DataFrame =
      rows.toDF("id", "fk", "cents")
        .withColumn("part", concat(lit("p"), $"id" % 3))
    val d0 = dim((10, "x"), (20, "y"))
    val f0 = factP((1, 10, 100), (2, 20, 200), (3, 10, 300), (4, 20, 400))
    val mv = MedallionTable(spark, tmpDir("ij_pmv"),
      partitionColumns = Seq("part"))
    mv.overwrite(IncrementalJoin.fullCompute(f0, d0, on))
    // update id=1; id=2 moves onto a dangling key (DV removal); id=4
    // deleted (DV removal); id=5 inserts joinable
    val f1 = factP((1, 10, 101), (2, 99, 200), (3, 10, 300), (5, 20, 500))
    IncrementalJoin.applyFactChanges(mv, cdc(f0, f1, "id"), d0,
      factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f1, d0, on)))
    // dim side: dk=20 deleted (cascaded DV removal), dk=30 inserted
    val d1 = dim((10, "x"), (30, "z"))
    IncrementalJoin.applyDimChanges(mv, f1, d1, cdc(d0, d1, "dk"),
      factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f1, d1, on)))
  }

  test("a partition-column move is detected and falls back, staying correct") {
    import spark.implicits._
    val d = dim((10, "x"), (20, "y"))
    val f0 = Seq((1L, 10L, 100L, "pA"), (2L, 20L, 200L, "pA"))
      .toDF("id", "fk", "cents", "part")
    val f1 = Seq((1L, 10L, 101L, "pB"), (2L, 20L, 200L, "pA"))
      .toDF("id", "fk", "cents", "part") // id=1 MOVES pA → pB
    val mv = MedallionTable(spark, tmpDir("ij_pmove"),
      partitionColumns = Seq("part"))
    mv.overwrite(IncrementalJoin.fullCompute(f0, d, on))
    IncrementalJoin.applyFactChanges(mv, cdc(f0, f1, "id"), d, factKeys, on)
    assert(asSet(mv.read) == asSet(IncrementalJoin.fullCompute(f1, d, on)))
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
