package graft.operators

import graft.SparkSpec

/** Fusion algebra of [[Rrf.fuse]] (the catalog's hybrid queries pin the
  * two-arm arithmetic against a DuckDB oracle; this pins the generic
  * N-arm operator on hand-checkable fixtures).
  */
class RrfSpec extends SparkSpec {

  private def arm(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toDF("id", "rank")
  }

  private def c(rank: Int): Long = math.round(1000000.0 / (60 + rank))

  test("two arms: shared ids sum contributions, arm-only ids keep one") {
    val got = Rrf.fuse(Seq(arm(1L -> 1, 2L -> 2), arm(1L -> 3, 9L -> 1)),
        "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = Seq(
      1L -> (c(1) + c(3)), 9L -> c(1), 2L -> c(2))
      .sortBy { case (id, s) => (-s, id) }
    assert(got == expect, s"got $got expect $expect")
  }

  test("three arms fuse; k truncates after the global order") {
    val got = Rrf.fuse(
        Seq(arm(1L -> 1, 2L -> 2), arm(2L -> 1, 3L -> 2), arm(3L -> 1, 1L -> 2)),
        "id", "rank", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every id has c(1)+c(2): ties broken by id ascending, truncated to 2
    assert(got == Seq(1L -> (c(1) + c(2)), 2L -> (c(1) + c(2))), s"got $got")
  }

  test("membership flags name the contributing arms") {
    val row = Rrf.fuse(Seq(arm(7L -> 1), arm()), "id", "rank", k = 1)
      .collect()(0)
    assert(row.getLong(0) == 7L && row.getBoolean(2) && !row.getBoolean(3))
  }
}
