package graft.ops

import graft.SparkSpec
import graft.queries.TextQueries

/** Shape invariants for the mixture-planning queries (exact values are
  * oracle-checked by the driver's DuckDB twins).
  */
class MixPlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("vocab coverage: monotone in min_freq, exact at threshold 1") {
    val rows = TextQueries.defs("text_vocab_coverage")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 5, 10, 20, 50, 100))
    // min_freq = 1 keeps everything
    val (_, _, cov1, total1, micro1) = rows.head
    assert(cov1 == total1 && micro1 == 1000000L)
    // raising the threshold never grows the vocabulary or the coverage
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3 && b._5 <= a._5,
        s"coverage not monotone between min_freq ${a._1} and ${b._1}")
    }
    assert(rows.forall(r => r._5 >= 0 && r._5 <= 1000000L))
  }

  test("temperature mixing: weights normalize and flatten the source skew") {
    val rows = TextQueries.defs("sample_mix_temperature")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length >= 2, "fixture has a single source; skew test is vacuous")
    // weights sum to 1 up to per-source rounding
    val sum = rows.map(_._4).sum
    assert(math.abs(sum - 1000000L) <= rows.length,
      s"weights sum to $sum, not ~1e6")
    // alpha < 1 flattens: the weight ratio is strictly inside the count
    // ratio for any size-skewed source pair (w_a/w_b < n_a/n_b)
    for (a <- rows; b <- rows if a._2 > b._2)
      assert(a._4.toDouble / b._4 < a._2.toDouble / b._2,
        s"${a._1} vs ${b._1}: temperature did not flatten")
  }
}
