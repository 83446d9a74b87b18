package graft.ops

import graft.SparkSpec
import graft.queries.TextQueries

/** Shape invariants for BM25 retrieval and DSIR importance weights (exact
  * values are oracle-checked by the driver at micro-unit precision).
  */
class RetrievalDsirSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bm25: ranked list is <= 10, strictly ordered, positive, distinct docs") {
    val rows = TextQueries.defs("text_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate doc in top-k")
    val scores = rows.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores increase down the ranking")
    // Lucene idf ln(1 + (N-df+.5)/(df+.5)) > 0 even at df = N, and tf,
    // length norm are positive — a non-positive score means a formula bug
    assert(scores.forall(_ > 0), "BM25 score must be positive for a matching doc")
  }

  test("dsir: one row per doc with >= 2 tokens, n_bigrams = tokens - 1, deterministic") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", s"SIZE(${graft.queries.Q.TokensExpr}) AS n")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    def run() = TextQueries.defs("sample_dsir_weights")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val got = run()
    val expected = docs.filter(_._2 >= 2)
    assert(got.keySet == expected.keySet, "row set != docs with >= 2 tokens")
    expected.foreach { case (id, n) =>
      assert(got(id)._1 == n - 1L, s"doc $id: n_bigrams ${got(id)._1} != ${n - 1}")
    }
    assert(got == run(), "weights differ between identical runs")
  }
}
