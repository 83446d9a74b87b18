package graft.ops

import graft.{SparkSpec, Tables}
import graft.queries.TextQueries

/** Shape + planted-ground-truth invariants for global segment dedup
  * (exact values are oracle-checked by the driver's DuckDB twin).
  */
class ParagraphDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("first occurrence wins: planted higher-id copies keep nothing") {
    val rows = TextQueries.defs("dedup_paragraph_global")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = rows.map(r => r._1 -> r).toMap
    val nDocs = Tables.documents(spark, dir).count()
    // the corpus-wide suffix gives every doc >= 2 segments
    assert(rows.length == nDocs, s"${rows.length} rows for $nDocs docs")
    rows.foreach { case (doc, nSeg, nKept, clean) =>
      assert(nKept >= 0 && nKept <= nSeg, s"doc $doc kept $nKept of $nSeg")
      assert((nKept == 0) == clean.isEmpty, s"doc $doc clean_text/n_kept disagree")
    }
    // doc k (k % 25 == 0, k > 0) carries doc k+1's text verbatim, so the
    // HIGHER id k+1 sees every one of its segments already kept at doc k
    // (or earlier) and must keep nothing
    val planted = byDoc.keys.filter(k =>
      k > 0 && k % 25 == 0 && byDoc.contains(k + 1)).toSeq
    assert(planted.nonEmpty, "fixture has no planted pairs")
    planted.foreach { k =>
      val (_, _, nKept, clean) = byDoc(k + 1)
      assert(nKept == 0 && clean.isEmpty,
        s"planted copy doc ${k + 1} kept $nKept segments")
    }
  }
}
