package graft.ops

import graft.SparkSpec
import graft.dedup.SubstringDedup

/** Planted ground truth for [[SubstringDedup.repeatedSpans]] — the
  * exact-substring (suffix-array-class) dedup surface. Exact corpus
  * values are oracle-checked by the driver's DuckDB twin
  * (`dedup_substring_spans`); this pins the span SEMANTICS: maximal
  * coverage merge, same-document repeats, and content digests.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted repeats: cross-doc copies cover exactly the shared " +
      "block; same-doc repeats yield twin spans; unique text is silent") {
    val uniq1 = (0 until 30).map(i => s"a$i").mkString(" ")
    val uniq2 = (0 until 25).map(i => s"b$i").mkString(" ")
    val shared = (0 until 20).map(i => s"shared$i").mkString(" ")
    val rep = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$uniq1 $shared"), // tail = 20-token shared block
      (2L, s"$shared $uniq2"), // head = same block (cross-doc repeat)
      // same-doc repeat: r1..r8 at positions 11 and 21
      (3L, (1 to 10).map(i => s"x$i").mkString(" ") +
        s" $rep mid1 mid2 $rep"),
      (4L, (0 until 40).map(i => s"u$i").mkString(" ")) // unique
    ).toDF("doc_id", "text")
    val got = SubstringDedup.repeatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(s => (s._1, s._2))
    val byDoc = got.groupBy(_._1)
    // doc 1: one span covering exactly the shared block (31..50)
    assert(byDoc(1L).map(s => (s._2, s._3)).toSeq == Seq((31L, 20L)))
    // doc 2: the same block at the head (1..20), same content digest
    assert(byDoc(2L).map(s => (s._2, s._3)).toSeq == Seq((1L, 20L)))
    assert(byDoc(1L).head._4 == byDoc(2L).head._4,
      "identical span content ⇒ identical span_md5")
    // doc 3: TWO maximal spans (starts 11 and 21 are >k apart), twins
    assert(byDoc(3L).map(s => (s._2, s._3)).toSeq ==
      Seq((11L, 8L), (21L, 8L)))
    assert(byDoc(3L).map(_._4).distinct.size == 1,
      "a same-document repeat yields digest-identical twin spans")
    // doc 4: nothing
    assert(!byDoc.contains(4L))
  }

  test("removeLaterOccurrences keeps the globally-first copy intact, " +
      "excises later ones, and cleans an exact duplicate to empty") {
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val uniq = (0 until 15).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, shared), // first site: kept verbatim
      (2L, s"$uniq $shared"), // later copy: shared block excised
      (3L, shared) // exact duplicate of doc 1: cleans to empty
    ).toDF("doc_id", "text")
    val got = SubstringDedup.removeLaterOccurrences(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val md5Of: String => String = s => java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1L) == ((20L, md5Of(shared))), "first copy untouched")
    assert(got(2L) == ((15L, md5Of(uniq))), "later copy excised exactly")
    assert(got(3L) == ((0L, md5Of(""))), "exact duplicate cleans to empty")
  }

  test("abutting duplicated windows fuse into one maximal span") {
    // doc 5 copies a 30-token block from doc 6 split across the gram
    // width: every start in the block is duplicated, so the coverage
    // islands fuse into ONE span of 30, not 23 unit windows
    val block = (0 until 30).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (5L, s"p1 p2 p3 $block q1 q2"),
      (6L, block)
    ).toDF("doc_id", "text")
    val got = SubstringDedup.repeatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(s => (s._1, s._2))
    assert(got.toSeq == Seq((5L, 4L, 30L), (6L, 1L, 30L)))
  }
}
