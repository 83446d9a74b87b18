package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Golden-frame tests for the 3-clause merge semantics (SURVEY.md §5.2):
  * update / insert / not-matched-by-source delete, schema evolution,
  * Delta-parity corner cases, and idempotence.
  */
class MergeOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def target: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
  }
  private def source: DataFrame = {
    import spark.implicits._
    // id=1 unchanged, id=2 changed, id=4 new; id=3 absent (delete clause)
    Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)).toDF("id", "name", "v")
  }

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("3-clause merge: update + insert + not-matched-by-source delete") {
    val out = MergeOps.merge3Clause(target, source, Seq("id"))
    assert(asSet(out) == Set(
      Seq(1L, "a", 10.0), Seq(2L, "B", 21.0), Seq(4L, "d", 40.0)))
  }

  test("upsert (deleteNotMatchedBySource=false) keeps unmatched target rows") {
    val out = MergeOps.merge3Clause(target, source, Seq("id"),
      deleteNotMatchedBySource = false)
    assert(asSet(out) == Set(
      Seq(1L, "a", 10.0), Seq(2L, "B", 21.0), Seq(3L, "c", 30.0), Seq(4L, "d", 40.0)))
  }

  test("anyColumnDiffers gate: unchanged matched rows keep target values") {
    val cond = MergeOps.anyColumnDiffers(target, source, Seq("id"))
    val out = MergeOps.merge3Clause(target, source, Seq("id"), Some(cond),
      deleteNotMatchedBySource = false)
    assert(asSet(out) == Set(
      Seq(1L, "a", 10.0), Seq(2L, "B", 21.0), Seq(3L, "c", 30.0), Seq(4L, "d", 40.0)))
  }

  test("schema evolution: source-only column typed-null-padded on target side") {
    import spark.implicits._
    val src = Seq((2L, "B", 21.0, 99), (4L, "d", 40.0, 77))
      .toDF("id", "name", "v", "extra")
    val out = MergeOps.merge3Clause(target, src, Seq("id"),
      deleteNotMatchedBySource = false)
    assert(out.schema("extra").dataType.typeName == "integer") // not NullType
    assert(asSet(out) == Set(
      Seq(1L, "a", 10.0, null), Seq(2L, "B", 21.0, 99),
      Seq(3L, "c", 30.0, null), Seq(4L, "d", 40.0, 77)))
    // round-trips through parquet (NullType would fail here)
    val p = tmpDir("merge_evo")
    out.write.parquet(p)
    assert(spark.read.parquet(p).count() == 4)
  }

  test("Delta parity: target-only columns retained on matched update") {
    import spark.implicits._
    val src = Seq((2L, 21.0), (4L, 40.0)).toDF("id", "v") // no "name"
    val out = MergeOps.merge3Clause(target, src, Seq("id"))
    // matched id=2 keeps its target name; inserted id=4 has null name
    assert(asSet(out) == Set(Seq(2L, "b", 21.0), Seq(4L, null, 40.0)))
  }

  test("requireUniqueKeys rejects duplicate source keys (Delta parity)") {
    import spark.implicits._
    val dup = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException] {
      MergeOps.requireUniqueKeys(dup, Seq("id"))
    }
    MergeOps.requireUniqueKeys(source, Seq("id")) // clean source passes
  }

  test("merge is idempotent: re-merging the same source is a no-op") {
    val once = MergeOps.merge3Clause(target, source, Seq("id"))
    val twice = MergeOps.merge3Clause(once, source, Seq("id"))
    assert(asSet(once) == asSet(twice))
  }

  test("CDC merge emits exactly the change rows (Delta CDF semantics)") {
    val cond = MergeOps.anyColumnDiffers(target, source, Seq("id"))
    val out = MergeOps.merge3ClauseCDC(target, source, Seq("id"), Some(cond))
    assert(asSet(out) == Set(
      Seq(4L, "d", 40.0, "insert"),
      Seq(2L, "b", 20.0, "update_preimage"),
      Seq(2L, "B", 21.0, "update_postimage"),
      Seq(3L, "c", 30.0, "delete")))
    // id=1 is matched-but-unchanged: no change row (checked via exact set)
  }

  test("composite keys and self-lineage source (ambiguity regression)") {
    import spark.implicits._
    val base = Seq((1L, "p", 1.0), (1L, "q", 2.0), (2L, "p", 3.0))
      .toDF("k1", "k2", "v")
    // source derived from target's own lineage — must not trip
    // Spark's ambiguous-self-join analysis
    val src = base.filter($"k1" === 1L).withColumn("v", $"v" * 10)
    val out = MergeOps.merge3Clause(base, src, Seq("k1", "k2"))
    assert(asSet(out) == Set(Seq(1L, "p", 10.0), Seq(1L, "q", 20.0)))
  }
}
