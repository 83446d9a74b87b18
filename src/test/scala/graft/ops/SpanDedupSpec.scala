package graft.ops

import graft.{SparkSpec, Tables}
import graft.queries.TextQueries

/** Shape + planted-ground-truth invariants for cross-document
  * repeated-span detection (exact values are oracle-checked by the
  * driver's DuckDB twin).
  */
class SpanDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("planted (k, k+1) pairs are fully covered; run arithmetic consistent") {
    val rows = TextQueries.defs("dedup_span_runs")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)

    // every run's gram count must equal its start-position run length:
    // n_dup_grams = (span_end - 7) - span_start + 1
    rows.foreach { case (doc, s0, s1, n) =>
      assert(n == (s1 - 7) - s0 + 1, s"doc $doc run ($s0,$s1) has $n grams")
      assert(s0 >= 1 && s1 >= s0 + 7, s"doc $doc degenerate span ($s0,$s1)")
    }

    // planted docs (k % 25 == 0, k > 0) are verbatim copies of doc k+1,
    // so BOTH sides must carry one full-coverage span (1, n_tokens)
    val nTok = Tables.documents(spark, dir)
      .selectExpr("doc_id", s"SIZE(${graft.queries.Q.TokensExpr}) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = rows.groupBy(_._1)
    val planted = nTok.keys.filter(k =>
      k > 0 && k % 25 == 0 && nTok.get(k + 1).exists(_ >= 8))
    assert(planted.nonEmpty, "fixture has no planted pairs")
    planted.foreach { k =>
      val n = nTok(k + 1) // doc k carries doc k+1's text
      Seq(k, k + 1).foreach { d =>
        val full = byDoc.getOrElse(d, Array.empty)
          .exists { case (_, s0, s1, _) => s0 == 1 && s1 == n }
        assert(full, s"planted doc $d lacks full-coverage span (1, $n)")
      }
    }
  }
}
