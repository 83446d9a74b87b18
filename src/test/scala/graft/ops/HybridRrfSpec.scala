package graft.ops

import graft.SparkSpec
import graft.queries.PipelineOpsQueries

/** Fusion invariants for hybrid BM25 + dense-cosine retrieval with
  * reciprocal-rank fusion (exact values are oracle-checked by the driver
  * at micro-unit precision; these pin the fusion ALGEBRA so an arm or
  * join regression fails locally before the oracle sees it).
  */
class HybridRrfSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def run() = PipelineOpsQueries.defs("sim_hybrid_rrf")(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))

  test("fused top-10: ordered, distinct, every row from at least one arm") {
    val rows = run()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate doc")
    val scores = rows.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "rrf_micro increases down the ranking")
    assert(rows.forall(r => r._3 || r._4),
      "a fused row must come from the sparse or the dense arm")
    // RRF contribution bounds: one arm yields at most round(1e6/61) and
    // at least round(1e6/80); two arms at most double the ceiling
    assert(scores.forall(s => s >= 12500L && s <= 2 * 16393L),
      s"score outside single/double-arm RRF bounds: ${scores.mkString(",")}")
  }

  test("two-arm members dominate: both-arms score exceeds any one-arm max possible at same ranks") {
    val rows = run()
    val both = rows.filter(r => r._3 && r._4).map(_._2)
    // every two-arm doc beats the single-arm ceiling round(1e6/61)
    both.foreach(s => assert(s > 16393L, s"two-arm score $s below one-arm ceiling"))
  }

  test("deterministic across runs") {
    assert(run().toSeq == run().toSeq, "fusion output differs between runs")
  }
}
