package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent standing dedup index — the table-maintenance half of the
  * incremental-dedup story (`dedup_incremental` proves the join shape;
  * this owns the state): ONE append-only [[graft.table.MedallionTable]]
  * holding both row kinds — content-hash rows `(doc_id, h)` for exact-dup
  * membership and LSH band rows `(doc_id, band_idx, band_key)` for
  * near-dup candidates — distinguished by which columns are null. Each
  * row is 16-64 bytes regardless of document size, and parquet column
  * pruning keeps the two check() scans reading only their own columns,
  * so the unified layout costs no extra bytes over the former two-table
  * one.
  *
  * One table ⇒ ONE commit per ingest (round-15, verdict #8): the former
  * hash_set + band_index pair paid two commit-protocol rounds (~0.45 s
  * each at the measured floor, ProfileCurate) per daily batch, and a
  * crash between them could split a batch's hash rows from its band
  * rows. The pair now lands atomically in a single append.
  *
  * The daily-batch protocol a 100 TB corpus runs:
  * {{{
  *   idx.check(batch)   // dedup today's landing against the index as
  *                      // WRITTEN by prior batches — never the corpus
  *   idx.ingest(batch)  // then append today's keys (index maintenance)
  * }}}
  * `check` reads ONLY the index table: the equi-joins move index rows,
  * never documents, and the batch side is the small one (broadcastable
  * per batch, bucketed at full scale). `ingest` is an ordinary
  * distributed append — commit-marked like every MedallionTable write,
  * so a concurrent rewrite (compaction of the index) conflicts cleanly
  * instead of discarding the day's keys.
  *
  * Band construction is caller-supplied (`bandKeys`): the oracle-checked
  * queries pass the MD5 2-band builder, scale users pass the xxhash64
  * `graft_xx_minhash_bands` one — the index machinery is hash-agnostic
  * (band keys are stored through an injective string cast, so long- and
  * string-keyed builders share the layout).
  *
  * Reference: the reference's medallion pipeline re-merges full tables
  * per run (`silver_table_creation.py:43-66`); an append-only key index
  * is what makes dedup O(batch), not O(corpus), at 100 TB.
  */
final class StandingDedupIndex(
    spark: SparkSession,
    basePath: String,
    bandKeys: DataFrame => DataFrame) {

  /** The unified key index (hash rows: `h` set, band columns null; band
    * rows: the converse). Partitioned by `batch_tag` (keys are too
    * high-cardinality to partition on): the excludeTag replay filter and
    * tag compaction prune to directories instead of scanning every prior
    * batch's keys.
    */
  val indexTable = graft.table.MedallionTable(spark, s"$basePath/key_index",
    partitionColumns = Seq("batch_tag"))

  private def hashesOf(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), md5(col("text")).as("h"))

  /** Caller-built band rows normalized to the stored layout: band_idx as
    * INT, band_key through an injective STRING cast (check() casts its
    * batch side identically, so join equality is exact for any builder).
    */
  private def bandsOf(batch: DataFrame): DataFrame =
    bandKeys(batch).select(col("doc_id"),
      col("band_idx").cast("int").as("band_idx"),
      col("band_key").cast("string").as("band_key"))

  /** Dedup `batch` (doc_id, text) against the standing index as written
    * by prior ingests: exact dups via the content-hash equi-join,
    * near-dup candidates via the band-key equi-join. Returns one row per
    * batch doc: (doc_id, is_exact_dup, n_candidates). Lazy like any
    * DataFrame — materialize the result BEFORE ingesting the same batch,
    * or the batch will count itself. Before the first ingest the index
    * reads as EMPTY (typed off the batch's own derivations), so a
    * streaming sink's first micro-batch checks cleanly.
    */
  def check(batch: DataFrame, excludeTag: Option[Long] = None): DataFrame =
    checkWith(hashesOf(batch), bandsOf(batch), batch, excludeTag)

  private def checkWith(hashes: DataFrame, bands: DataFrame,
      batch: DataFrame, excludeTag: Option[Long]): DataFrame = {
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
    val idx = if (indexTable.exists) Some(minusTag(indexTable.read)) else None
    val corpusHashes = idx
      .map(_.filter(col("h").isNotNull).select(col("h")))
      .getOrElse(hashes.select(col("h")).limit(0))
    val corpusBands = idx
      .map(_.filter(col("band_idx").isNotNull)
        .select(col("band_idx"), col("band_key"),
          col("doc_id").as("corpus_id")))
      .getOrElse(bands.select(col("band_idx"), col("band_key"),
        col("doc_id").as("corpus_id")).limit(0))
    val exact = hashes
      .join(corpusHashes.distinct(), Seq("h"))
      .select("doc_id").distinct().withColumn("is_exact_dup", lit(true))
    val cands = bands
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

  /** Append `batch`'s hash and band rows to the index, tagged with `tag`
    * (a batch/epoch id — [[check]]'s excludeTag and replay recovery key
    * on it), as ONE commit: every doc contributes a hash row; only docs
    * the band builder accepts (≥ 3 tokens for the shingle-based
    * builders) contribute band rows; the pair cannot split across a
    * crash. A replayed recent tag re-appends duplicate rows the
    * semantics tolerate (the exact join is membership-only and
    * candidates are DISTINCT-ed) — what makes a foreachBatch replay
    * safe. A replayed ARCHIVED tag is a strict no-op (its partition is
    * gone, so only the watermark knows it landed — and a re-append would
    * break the "archive holds at most a bounded number of copies"
    * property).
    */
  def ingest(batch: DataFrame, tag: Long = 0L): Unit =
    ingestWith(hashesOf(batch), bandsOf(batch), tag)

  private def ingestWith(hashes0: DataFrame, bands0: DataFrame,
      tag: Long): Unit = {
    // a tag at or below the compaction watermark is KNOWN-ingested even
    // though its partition has been folded into the archive — replaying
    // it must stay a no-op, not a double count
    if (tag <= graft.table.TagArchive.watermark(spark, basePath)) return
    val hashes = hashes0
      .withColumn("band_idx", lit(null).cast("int"))
      .withColumn("band_key", lit(null).cast("string"))
    val bands = bands0
      .withColumn("h", lit(null).cast("string"))
      .select("doc_id", "h", "band_idx", "band_key")
    indexTable.append(
      hashes.unionByName(bands).withColumn("batch_tag", lit(tag)))
  }

  /** check + ingest of ONE batch under ONE shared signature computation
    * (the curate funnel's dominant repeated work: `hashesOf`/`bandsOf`
    * re-hash every document's text, and running check and ingest
    * separately paid that twice per micro-batch — ProfileCurate phase
    * table, SCALING.md round 16). The signature frames are persisted
    * once and feed the replay-idempotent check (excludeTag = this tag),
    * the caller's `between` stage (curated write — runs AFTER the check
    * report is available and BEFORE the ingest, preserving the funnel's
    * exactly-once ordering contract), and the single-commit ingest.
    * Returns the check report (already consumed by `between`, returned
    * for callers that want it).
    */
  def checkAndIngest(batch: DataFrame, tag: Long)(
      between: DataFrame => Unit = _ => ()): DataFrame = {
    val hashes = hashesOf(batch).persist()
    val bands = bandsOf(batch).persist()
    try {
      val report = checkWith(hashes, bands, batch, excludeTag = Some(tag))
      between(report)
      ingestWith(hashes, bands, tag)
      report
    } finally { hashes.unpersist(); bands.unpersist() }
  }

  /** Fold every `batch_tag ≤ w` partition of the index into the single
    * archive partition ([[graft.table.TagArchive]]): at daily cadence the
    * per-tag directories that make replay probes O(1) become a listing
    * burden after a year; compaction keeps the index content-identical
    * (check() results are unchanged — the joins don't care which
    * partition a key row lives in) while collapsing the layout to
    * archive + recent tags. Replay of a COMPACTED tag is handled by the
    * watermark in [[ingest]]; `excludeTag` replay-checks are only valid
    * above the watermark (enforced in [[check]]) — the recovery window
    * replay actually needs, since a crashed batch is the newest one.
    */
  def compactThrough(w: Long, nFiles: Int = 4): Unit = {
    graft.table.TagArchive.archiveThrough(indexTable, w, nFiles)
    val prev = graft.table.TagArchive.watermark(spark, basePath)
    if (w > prev) graft.table.TagArchive.setWatermark(spark, basePath, w)
  }
}
