package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent benchmark-contamination index — `text_decontaminate`'s
  * n-gram overlap check with the benchmark side PERSISTED: eval suites
  * change rarely, so their k-token-gram fingerprints ingest once into a
  * standing [[graft.table.MedallionTable]] and every corpus batch checks
  * against the table with one equi-join — O(batch grams), never a
  * re-fingerprint of the benchmark union per run, and new eval suites
  * land as new tags without touching prior ones.
  *
  * Semantics are membership (shared-gram counts DISTINCT the gram
  * stream), so the index is duplicate-tolerant like
  * [[graft.dedup.StandingDedupIndex]] — replayed ingests re-append
  * harmlessly and compaction can use the shared
  * [[graft.table.TagArchive]] append-then-delete fold (crash between
  * steps leaves duplicates the DISTINCT absorbs), with the watermark
  * keeping archived-tag replays no-ops.
  *
  * Gram rows are (bench_id, gram, batch_tag): bench_id supports
  * self-exclusion when the checked corpus CONTAINS the benchmark docs
  * (the `text_decontaminate` shape) and per-benchmark attribution in
  * contamination reports; gram is the md5 of the k-token window
  * (`graft_token_grams`), 32 bytes regardless of document size.
  */
final class DecontaminationIndex(
    spark: SparkSession,
    basePath: String,
    k: Int = 8) {

  val gramTable = graft.table.MedallionTable(spark, s"$basePath/grams",
    partitionColumns = Seq("batch_tag"))

  private def grams(docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.repartition(col("doc_id"))
      .selectExpr("doc_id", s"EXPLODE(graft_token_grams(text, $k)) AS gram")
      .distinct()
  }

  /** Append `bench` (doc_id, text) docs' gram fingerprints under `tag`
    * (one tag per eval-suite drop). Duplicate-tolerant under replay;
    * archived tags no-op via the compaction watermark.
    */
  def ingest(bench: DataFrame, tag: Long): Unit = {
    if (tag <= graft.table.TagArchive.watermark(spark, basePath)) return
    gramTable.append(grams(bench)
      .select(col("doc_id").as("bench_id"), col("gram"))
      .withColumn("batch_tag", lit(tag)))
  }

  /** Per-doc contamination report for `batch` (doc_id, text) against
    * everything ingested so far: (doc_id, n_shared_grams, contaminated).
    * The index side is eval-suite-sized — broadcast, so the corpus gram
    * stream never shuffles. Docs that ARE benchmark docs self-exclude
    * via bench_id. Before the first ingest the index reads as empty.
    */
  def check(batch: DataFrame): DataFrame = {
    val idx =
      if (gramTable.exists) gramTable.read.select(col("bench_id"), col("gram"))
      else grams(batch).select(col("doc_id").as("bench_id"), col("gram")).limit(0)
    val hits = grams(batch)
      .join(broadcast(idx), Seq("gram"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
    batch.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(COALESCE(n_shared_grams, 0) AS BIGINT) AS n_shared_grams",
        "n_shared_grams IS NOT NULL AS contaminated")
  }

  /** Fold tags ≤ w into the archive partition (membership semantics ⇒
    * the duplicate-tolerant TagArchive fold applies as-is).
    */
  def compactThrough(w: Long, nFiles: Int = 4): Unit = {
    graft.table.TagArchive.archiveThrough(gramTable, w, nFiles)
    if (w > graft.table.TagArchive.watermark(spark, basePath))
      graft.table.TagArchive.setWatermark(spark, basePath, w)
  }
}
