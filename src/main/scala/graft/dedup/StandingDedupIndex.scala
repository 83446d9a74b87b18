package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent standing dedup index — the table-maintenance half of the
  * incremental-dedup story (`dedup_incremental` proves the join shape;
  * this owns the state): two append-only [[graft.table.MedallionTable]]s,
  * a content-hash set `(doc_id, h)` and an LSH band index
  * `(doc_id, band_idx, band_key)`, each row 16-64 bytes regardless of
  * document size.
  *
  * The daily-batch protocol a 100 TB corpus runs:
  * {{{
  *   idx.check(batch)   // dedup today's landing against the index as
  *                      // WRITTEN by prior batches — never the corpus
  *   idx.ingest(batch)  // then append today's keys (index maintenance)
  * }}}
  * `check` reads ONLY the index tables: the equi-joins move index rows,
  * never documents, and the batch side is the small one (broadcastable
  * per batch, bucketed at full scale). `ingest` is an ordinary
  * distributed append — commit-marked like every MedallionTable write,
  * so a concurrent rewrite (compaction of the index) conflicts cleanly
  * instead of discarding the day's keys.
  *
  * Band construction is caller-supplied (`bandKeys`): the oracle-checked
  * queries pass the MD5 2-band builder, scale users pass the xxhash64
  * `graft_xx_minhash_bands` one — the index machinery is hash-agnostic.
  *
  * Reference: the reference's medallion pipeline re-merges full tables
  * per run (`silver_table_creation.py:43-66`); an append-only key index
  * is what makes dedup O(batch), not O(corpus), at 100 TB.
  */
final class StandingDedupIndex(
    spark: SparkSession,
    basePath: String,
    bandKeys: DataFrame => DataFrame) {

  /** Content-hash set (doc_id, h) — exact-dup membership. Partitioned by
    * `batch_tag` (h is too high-cardinality to partition on): the
    * excludeTag replay filter and any per-batch compaction prune to
    * directories instead of scanning every prior batch's keys.
    */
  val hashTable = graft.table.MedallionTable(spark, s"$basePath/hash_set",
    partitionColumns = Seq("batch_tag"))

  /** Band index (doc_id, band_idx, band_key) — near-dup candidates.
    * Partitioned by `batch_tag`, same rationale as [[hashTable]].
    */
  val bandTable = graft.table.MedallionTable(spark, s"$basePath/band_index",
    partitionColumns = Seq("batch_tag"))

  private def hashesOf(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), md5(col("text")).as("h"))

  /** Dedup `batch` (doc_id, text) against the standing index as written
    * by prior ingests: exact dups via the content-hash equi-join,
    * near-dup candidates via the band-key equi-join. Returns one row per
    * batch doc: (doc_id, is_exact_dup, n_candidates). Lazy like any
    * DataFrame — materialize the result BEFORE ingesting the same batch,
    * or the batch will count itself. Before the first ingest the index
    * reads as EMPTY (typed off the batch's own derivations), so a
    * streaming sink's first micro-batch checks cleanly.
    */
  def check(batch: DataFrame, excludeTag: Option[Long] = None): DataFrame = {
    // excludeTag makes a REPLAYED batch's check idempotent: a foreachBatch
    // sink that ingested tag T and crashed before its checkpoint commit
    // re-runs the same batch — excluding the index rows it tagged T makes
    // the re-check see exactly the pre-ingest index and reproduce the
    // original report instead of flipping every doc to a self-duplicate.
    excludeTag.foreach { t =>
      val wm = graft.table.TagArchive.watermark(spark, basePath)
      require(t > wm,
        s"excludeTag $t is at or below the compaction watermark $wm: its " +
          "rows were folded into the archive partition and can no longer " +
          "be excluded — only tags above the watermark are replayable")
    }
    def minusTag(df: DataFrame): DataFrame = excludeTag match {
      case Some(t) if df.columns.contains("batch_tag") =>
        df.filter(!(col("batch_tag") <=> lit(t)))
      case _ => df
    }
    val corpusHashes =
      if (hashTable.exists) minusTag(hashTable.read).select(col("h"))
      else hashesOf(batch).select(col("h")).limit(0)
    val corpusBands =
      if (bandTable.exists)
        minusTag(bandTable.read).select(col("band_idx"), col("band_key"),
          col("doc_id").as("corpus_id"))
      else bandKeys(batch).select(col("band_idx"), col("band_key"),
        col("doc_id").as("corpus_id")).limit(0)
    val exact = hashesOf(batch)
      .join(corpusHashes.distinct(), Seq("h"))
      .select("doc_id").distinct().withColumn("is_exact_dup", lit(true))
    val cands = bandKeys(batch)
      .join(corpusBands, Seq("band_idx", "band_key"))
      .select("doc_id", "corpus_id").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    batch.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(cands, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "COALESCE(is_exact_dup, false) AS is_exact_dup",
        "CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates")
  }

  /** Append `batch`'s hash and band rows to the index tables, tagged with
    * `tag` (a batch/epoch id — [[check]]'s excludeTag and replay recovery
    * key on it). Every doc contributes a hash row; only docs the band
    * builder accepts (≥ 3 tokens for the shingle-based builders)
    * contribute band rows.
    *
    * The two appends are not atomic as a pair: a crash between them
    * leaves the batch's hash rows without its band rows. Recovery is
    * re-running ingest for the same batch — duplicate index rows are
    * harmless (the exact join is membership-only and candidates are
    * DISTINCT-ed), which is also what makes a foreachBatch replay safe.
    * Replay behavior is deliberately ASYMMETRIC across the compaction
    * watermark: a replayed ARCHIVED tag is a strict no-op (its partition
    * is gone, so only the watermark knows it landed — and a re-append
    * would break the "archive holds at most a bounded number of copies"
    * property), while a replayed recent tag re-appends duplicates the
    * semantics tolerate; a tag-presence probe instead would silently
    * DROP band rows when recovering exactly the crash this paragraph
    * describes (hash rows present, band rows not).
    */
  def ingest(batch: DataFrame, tag: Long = 0L): Unit = {
    // a tag at or below the compaction watermark is KNOWN-ingested even
    // though its partition has been folded into the archive — replaying
    // it must stay a no-op, not a double count
    if (tag <= graft.table.TagArchive.watermark(spark, basePath)) return
    hashTable.append(hashesOf(batch).withColumn("batch_tag", lit(tag)))
    bandTable.append(bandKeys(batch)
      .select(col("doc_id"), col("band_idx"), col("band_key"))
      .withColumn("batch_tag", lit(tag)))
  }

  /** Fold every `batch_tag ≤ w` partition of BOTH index tables into the
    * single archive partition ([[graft.table.TagArchive]]): at daily
    * cadence the per-tag directories that make replay probes O(1) become
    * a listing burden after a year; compaction keeps the index
    * content-identical (check() results are unchanged — the joins don't
    * care which partition a key row lives in) while collapsing the
    * layout to archive + recent tags. Replay of a COMPACTED tag is
    * handled by the watermark in [[ingest]]; `excludeTag` replay-checks
    * are only valid above the watermark (enforced in [[check]]) — the
    * recovery window replay actually needs, since a crashed batch is the
    * newest one.
    */
  def compactThrough(w: Long, nFiles: Int = 4): Unit = {
    graft.table.TagArchive.archiveThrough(hashTable, w, nFiles)
    graft.table.TagArchive.archiveThrough(bandTable, w, nFiles)
    val prev = graft.table.TagArchive.watermark(spark, basePath)
    if (w > prev) graft.table.TagArchive.setWatermark(spark, basePath, w)
  }
}
