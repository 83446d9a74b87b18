package graft.ops

import graft.SparkSpec
import graft.queries.TextQueries

/** Shape invariants for TF-IDF keyword extraction (exact values are
  * oracle-checked by the driver at micro-unit precision).
  */
class TfidfSpec extends SparkSpec {
  test("top-3 terms per doc: contiguous ranks, non-increasing scores, idf sane") {
    val rows = TextQueries.defs("text_tfidf_topk")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to rs.length), s"doc $doc ranks not contiguous")
      assert(rs.length <= 3)
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc scores increase down the ranking")
    }
    // a term in every doc has idf 0 — it can never out-rank a rarer term
    // with positive score, so top terms are genuinely distinctive
    assert(rows.forall(_._4 >= 0), "ln(N/df) < 0 impossible: df <= N")
  }
}
