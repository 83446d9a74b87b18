package graft.ops

import graft.SparkSpec
import graft.similarity.Mmr

/** Diversification behavior of the MMR reranker (exact arithmetic is
  * oracle-checked by the driver via the unrolled-CTE twin; this pins the
  * property MMR exists for).
  */
class MmrSpec extends SparkSpec {

  private def cands(rows: (Long, Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("id", "rel_micro", "v")
  }

  test("a redundant near-copy of pick 1 is demoted below a diverse candidate") {
    // id 1: most relevant. id 2: near-copy of 1 (slightly less relevant).
    // id 3: clearly less relevant but orthogonal.
    val got = Mmr.rerank(cands(
        (1L, 1000000L, Seq(1.0, 0.0, 0.0)),
        (2L, 990000L, Seq(0.999, 0.01, 0.0)),
        (3L, 500000L, Seq(0.0, 1.0, 0.0))), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(0))).sorted
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected diverse 3 to outrank redundant 2: $got")
  }

  test("first pick is pure relevance; scores carry the pick-time penalty") {
    val rows = Mmr.rerank(cands(
        (7L, 800000L, Seq(1.0, 0.0)),
        (8L, 900000L, Seq(0.0, 1.0))), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(rows.head == ((8L, 1, 900000L)), s"pick 1 must be max-rel: $rows")
    // pick 2's score = rel − sim(7,8); orthogonal vectors ⇒ sim 0
    assert(rows(1) == ((7L, 2, 800000L)), s"orthogonal pick unpenalized: $rows")
  }

  test("corpus-sized input is rejected (rerank stages are bounded)") {
    import spark.implicits._
    val big = (0L until 50L).map(i => (i, 1000L, Seq(1.0, 0.0)))
      .toDF("id", "rel_micro", "v")
    intercept[IllegalArgumentException] {
      Mmr.rerank(big, k = 5, maxCandidates = 20)
    }
  }
}
