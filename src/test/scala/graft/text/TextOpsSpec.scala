package graft.text

import graft.SparkSpec

/** Chunking/packing edges the fixtures don't exercise: token-less docs,
  * exact-boundary lengths, bin straddling.
  */
class TextOpsSpec extends SparkSpec {

  test("chunkTokens: overlap, tail chunks, and token-less docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, ""),                                       // no tokens → no chunks
      (3L, "   "),                                    // whitespace only
      (4L, "solo")                                    // 1 token → 1 chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "doc_id", "text", size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList
      .sortBy(c => (c._1, c._2))
    assert(!out.exists(c => c._1 == 2L || c._1 == 3L), "token-less docs must not chunk")
    assert(out.filter(_._1 == 4L).map(_._3) == List("solo"))
    val doc1 = out.filter(_._1 == 1L).map(_._3)
    // starts 0,3,6,9 (floor(9/3)=3 → 4 chunks), size 4, last truncated
    assert(doc1 == List("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
  }

  test("packSequences: bins fill in id order, totals conserved") {
    import spark.implicits._
    // 10 docs × 30 tokens; target 100 → bins of ~3-4 docs
    val docs = (0 until 10).map(i =>
      (i.toLong, (1 to 30).map(t => s"w$t").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, "doc_id", "text", targetTokens = 100)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin_id"))).toMap
    // prev-cumsum bins: docs 0-3 → bin 0 (0,30,60,90), 4-6 → bin 1
    assert(out(0L) == 0L && out(3L) == 0L)
    assert(out(4L) == 1L && out(6L) == 1L)
    assert(out(7L) == 2L)
    // bin ids are non-decreasing in doc order
    val ordered = (0 until 10).map(i => out(i.toLong))
    assert(ordered == ordered.sorted)
  }

  test("pipeline_llm_curate: funnel drops bench/canary docs, layout stays dense") {
    val s = spark
    val out = graft.queries.TextQueries.defs("pipeline_llm_curate")(
      s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val total = s.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // the funnel actually selects: nonempty, strictly smaller than the corpus
    assert(out.nonEmpty && out.length < total, s"${out.length} of $total")
    // benchmark members and canary-contaminated docs never reach training
    assert(!out.exists { case (id, _, _) => id % 97 == 0 || id % 9 == 0 },
      "bench/contaminated doc leaked through the funnel")
    // every shard's positions are dense 1..|shard|
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size),
        s"shard $shard positions not dense")
    }
  }
}
