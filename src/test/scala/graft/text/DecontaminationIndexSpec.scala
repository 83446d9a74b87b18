package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Maintenance mechanics of the standing decontamination index (overlap
  * correctness vs the direct recompute is the driver oracle's job via
  * `text_decont_standing`).
  */
class DecontaminationIndexSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val canary = "the quick brown fox jumps over the lazy dog tonight"

  test("check before any ingest reports every doc clean") {
    val idx = new DecontaminationIndex(spark, tmpDir("dc_empty"))
    val out = idx.check(docs(1L -> canary)).collect()
    assert(out.length == 1 && !out(0).getBoolean(2) && out(0).getLong(1) == 0L)
  }

  test("a doc sharing an 8-gram with an ingested benchmark flags; others stay clean") {
    val idx = new DecontaminationIndex(spark, tmpDir("dc_flag"))
    idx.ingest(docs(100L -> s"benchmark question: $canary"), tag = 1L)
    val report = idx.check(docs(
        1L -> s"scraped page copying $canary verbatim",
        2L -> "completely unrelated prose with enough tokens to form grams here"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(report(1L)._2 && report(1L)._1 >= 1L, s"canary doc must flag: $report")
    assert(report(2L) == ((0L, false)), s"clean doc must not flag: $report")
  }

  test("benchmark docs self-exclude; replay and compaction leave reports unchanged") {
    val idx = new DecontaminationIndex(spark, tmpDir("dc_replay"))
    val bench = docs(100L -> s"eval item: $canary")
    idx.ingest(bench, tag = 1L)
    idx.ingest(docs(200L -> "second suite: nothing shared with anything else truly"), tag = 2L)
    // the benchmark doc itself is in the corpus: bench_id == doc_id rows
    // must not make it flag against itself
    val corpus = docs(100L -> s"eval item: $canary",
      5L -> s"contaminated by $canary again")
    val before = idx.check(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(!before.find(_._1 == 100L).get._3, "benchmark doc flagged against itself")
    assert(before.find(_._1 == 5L).get._3, "contaminated doc must flag")
    idx.compactThrough(1L)
    idx.ingest(bench, tag = 1L) // archived replay: watermark no-op
    idx.ingest(docs(200L -> "second suite: nothing shared with anything else truly"),
      tag = 2L) // recent replay: duplicate-tolerant
    val after = idx.check(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(after == before, s"replay/compaction changed the report: $before -> $after")
  }
}
