package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maintenance mechanics of the standing BM25 inverted index: replay is
  * exactly-once (counts are NOT duplicate-tolerant, unlike the dedup
  * index's membership rows), crash recovery between the postings and
  * stats appends converges, and the query path prunes to the probed
  * term buckets' directories. Score correctness vs the direct formula is
  * the driver oracle's job (`text_standing_bm25` ≡ `text_bm25_topk`).
  */
class StandingBm25IndexSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val b1 = Seq(1L -> "spark merge window spark", 2L -> "merge quick fox")
  private val b2 = Seq(3L -> "window spark lazy dog", 4L -> "plain prose only")

  private def scores(idx: StandingBm25Index): Seq[(Long, Long)] =
    idx.query(Seq("spark", "merge", "window"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("replayed tag is a strict no-op: postings, stats, and scores unchanged") {
    val idx = new StandingBm25Index(spark, tmpDir("bm25_replay"))
    idx.ingest(docs(b1: _*), tag = 1L)
    idx.ingest(docs(b2: _*), tag = 2L)
    val before = (idx.postings.read.count(), idx.docStats.read.count(), scores(idx))
    idx.ingest(docs(b2: _*), tag = 2L) // replay
    val after = (idx.postings.read.count(), idx.docStats.read.count(), scores(idx))
    assert(after == before, s"replay changed index state: $before -> $after")
  }

  test("crash between postings and stats appends: re-ingest converges to exactly-once counts") {
    val clean = new StandingBm25Index(spark, tmpDir("bm25_clean"))
    clean.ingest(docs(b1: _*), tag = 1L)
    clean.ingest(docs(b2: _*), tag = 2L)

    val crashed = new StandingBm25Index(spark, tmpDir("bm25_crash"))
    crashed.ingest(docs(b1: _*), tag = 1L)
    // simulate the crash window: tag 2's postings landed (partially —
    // one doc of two), the stats row did not
    crashed.postings.append(
      docs(b2.head).selectExpr("doc_id",
          s"TRANSFORM(${TextOps.tokensExpr("text")}, t -> LOWER(t)) AS toks")
        .select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(16)).cast("int"))
        .withColumn("batch_tag", lit(2L)))
    // the replayed ingest must partition-delete the partial tag and rewrite
    crashed.ingest(docs(b2: _*), tag = 2L)
    assert(crashed.postings.read.count() == clean.postings.read.count(),
      "posting count differs from a clean two-batch build")
    assert(scores(crashed) == scores(clean),
      "scores differ from a clean two-batch build after crash recovery")
  }

  test("compaction: scores invariant, archived replay no-ops, re-run converges") {
    val idx = new StandingBm25Index(spark, tmpDir("bm25_compact"))
    idx.ingest(docs(b1: _*), tag = 1L)
    idx.ingest(docs(b2: _*), tag = 2L)
    idx.ingest(docs(5L -> "spark spark late batch"), tag = 3L)
    val before = scores(idx)
    idx.compactThrough(2L)
    assert(scores(idx) == before, "compaction changed scores")
    // folded layout: tags 1 and 2 now live in the archive partition
    // partition-dir inference may read batch_tag back as int — normalize
    val tags = idx.docStats.read.selectExpr("CAST(batch_tag AS BIGINT)")
      .collect().map(_.getLong(0)).toSet
    assert(tags == Set(graft.table.TagArchive.ArchiveTag, 3L),
      s"expected archive + tag 3, got $tags")
    // replay of an ARCHIVED tag must be a watermark no-op (its stats row
    // is gone, so the probe alone would re-append and double counts)
    idx.ingest(docs(b1: _*), tag = 1L)
    assert(scores(idx) == before, "archived-tag replay changed scores")
    // re-running the same compaction converges (crash-recovery path)
    idx.compactThrough(2L)
    assert(scores(idx) == before, "re-run compaction changed scores")
    // term_bucket partitioning survives the fold (the probe pruning layout)
    assert(idx.postings.read.inputFiles.forall(_.contains("term_bucket=")),
      "postings lost the term_bucket partitioning in the fold")
  }

  test("query scans only the probed term buckets' directories") {
    val idx = new StandingBm25Index(spark, tmpDir("bm25_prune"), nBuckets = 16)
    // many distinct terms so the 16 buckets all get files
    val corpus = (0L until 64L).map(i => i -> s"term$i spark filler${i % 7}")
    idx.ingest(docs(corpus: _*), tag = 1L)
    assert(idx.postings.read.inputFiles.forall(_.contains("term_bucket=")),
      "postings must be hive-partitioned by term_bucket")
    val q = idx.query(Seq("spark"), k = 5)
    q.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case qs: QueryStageExec => scans(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      }.flatten
    val filesRead = scans(q.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    val allFiles = idx.postings.read.inputFiles.length
    // one term hashes to one bucket; the query reads that bucket's files
    // (twice: df pass + scoring pass) but never the other 15 buckets'
    assert(filesRead < allFiles,
      s"query read $filesRead files vs $allFiles total — no directory pruning")
  }
}
