package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Structured Streaming over the `events` table shape (TESTDATA.md):
  * watermarked windowed aggregation and custom sessionization state — the
  * brief's streaming surface (`readStream` → transforms → `writeStream`,
  * `flatMapGroupsWithState` for custom state). The reference itself is
  * batch-only (SURVEY.md §2.6); this is the north-star extension, and the
  * transforms are stream/batch agnostic (same code runs on a batch frame).
  *
  * Scale notes: windowed counts shuffle once on (window, event_type) with
  * partial aggregation; sessionization keys state by user_id — state store
  * size is bounded by active users × session payload, and event-time
  * timeout evicts idle sessions.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
      started: Timestamp, ended: Timestamp)

  /** Internal session accumulator (public: the state encoder's generated
    * code must be able to reach its accessors).
    */
  case class SessionState(n: Long, total: Double, startMs: Long, lastMs: Long)

  /** Per-user state: ALL still-open sessions, not just the newest. A late
    * in-watermark orphan opens a PRE-session that later orphans (or a
    * bridging event) must be able to merge into — emitting each orphan as
    * an immediate singleton splits sessions the gap contract says are one
    * (round-5 review finding). Sessions in the buffer are pairwise more
    * than `gap` apart by construction.
    */
  case class SessionBuf(sessions: Seq[SessionState])

  /** Merges one event into the open-session buffer. The event extends every
    * session whose extent ± gap covers it — at most two (the buffer keeps
    * sessions > gap apart), and touching two BRIDGES them into one.
    */
  private[streaming] def mergeEvent(sessions: List[SessionState], t: Long,
      v: Double, gapMs: Long): List[SessionState] = {
    val (touch, rest) = sessions.partition(s =>
      t >= s.startMs - gapMs && t <= s.lastMs + gapMs)
    touch.foldLeft(SessionState(1, v, t, t)) { (acc, s) =>
      SessionState(acc.n + s.n, acc.total + s.total,
        math.min(acc.startMs, s.startMs), math.max(acc.lastMs, s.lastMs))
    } :: rest
  }

  /** Splits the buffer into (closed, still-open) against the watermark: a
    * session only closes once no admissible event can extend or merge into
    * it. STRICT inequality (wm > lastMs + gap): [[mergeEvent]] admits an
    * event at exactly t == lastMs + gap, and Spark does not drop an event
    * with ts == watermark — closing at equality would send that boundary
    * event into a fresh session the gap contract says is the same one.
    * With strict close, any admissible future event has
    * t ≥ wm > lastMs + gap for every closed session, so the close and
    * merge predicates partition the timeline exactly.
    */
  private[streaming] def splitClosed(sessions: List[SessionState],
      watermarkMs: Long, gapMs: Long): (List[SessionState], List[SessionState]) =
    sessions.partition(s => s.lastMs + gapMs < watermarkMs)

  /** Streaming exact dedup — the streaming twin of the batch
    * `dedup_exact_hash` path: `dropDuplicatesWithinWatermark` keeps one
    * state entry per key seen within the watermark delay and EVICTS it as
    * the watermark advances, so state is bounded by the key arrival rate ×
    * delay (a plain streaming `dropDuplicates` would grow state forever).
    * Contract: duplicates are only suppressed while the first sighting is
    * within the watermark; a re-arrival after eviction passes through —
    * the standard at-least-once dedup trade.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Tumbling-window counts with a watermark: late events beyond the
    * watermark are dropped; windows close and emit once (append mode).
    */
  def windowedCounts(events: DataFrame,
      watermark: String = "10 minutes", windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100)) / 100.0).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming upsert sink: each micro-batch merges into a
    * [[graft.table.MedallionTable]] keyed on `keys`
    * (deleteNotMatchedBySource=false — batches accumulate, replays
    * overwrite in place, so the sink is idempotent under reprocessing:
    * exactly the property the reference's batch MERGE exists for, lifted
    * to Structured Streaming).
    */
  def upsertStream(events: DataFrame, tablePath: String, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val t = graft.table.MedallionTable(batch.sparkSession, tablePath)
        if (!t.exists) t.overwrite(batch)
        else t.merge(batch, keys, deleteNotMatchedBySource = false)
      }
      .start()

  /** [[upsertStream]] through the deletion-vector MERGE
    * ([[graft.table.MedallionTable.mergeVectored]]): per-batch write cost
    * O(batch) — marks + one staged batch, committed by one atomic rename —
    * instead of the rewrite merge's O(table). THE streaming shape at
    * 100 TB: a continuous upsert stream cannot pay a full-table rewrite
    * per micro-batch; it pays O(batch) per batch and lets OPTIMIZE
    * materialize the accumulated amendments on a maintenance cadence
    * (autoCompact bounds the creep).
    *
    * Replay safety is CONTENT-level idempotence: the upsert clauses set
    * every source column, so a replayed batch re-marks the (already
    * current) versions and rewrites identical values — reads never change.
    * Each batch is deduplicated on the keys first: micro-batches routinely
    * carry several versions of one key, and MERGE (Delta parity) refuses
    * duplicate source keys; last-write-wins needs an ordering column the
    * caller does not have here, so "any of the batch's versions, exactly
    * one of them" is the contract (same as the rewrite sink's, which
    * inherits it from dropDuplicates-before-merge reference pipelines).
    */
  def upsertStreamVectored(events: DataFrame, tablePath: String,
      keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.dropDuplicates(keys)
        val t = graft.table.MedallionTable(batch.sparkSession, tablePath)
        if (!t.exists) t.overwrite(b)
        else {
          import graft.table.MergeOps._
          val set: Map[String, (ColRef, ColRef) => Column] =
            b.columns.toSeq.map(c =>
              c -> ((_: ColRef, s: ColRef) => s(c))).toMap
          t.mergeVectored(b, keys.map(k => k -> k),
            Seq(WhenMatchedUpdate(None, set)),
            Seq(WhenNotMatchedInsert(None, set)))
        }
      }
      .start()

  /** Streaming CDC replication: each micro-batch DV-upserts the source
    * table (as [[upsertStreamVectored]]), then brings a downstream
    * MIRROR up to date through the source's writer-captured change feed
    * ([[graft.table.ChangeFeed.replicateTo]]) — per-batch cost is
    * O(batch) marks on the source plus O(changes) net-effect apply on
    * the mirror, never a rescan of either table. The source must have
    * `enableChangeDataFeed()` armed (the stream arms it on create).
    *
    * Exactly-once effect by the watermark argument in `replicateTo`'s
    * scaladoc: a replayed batch re-upserts identical content and the
    * mirror's watermark-keyed window re-applies the same terminal
    * states. Self-healing like [[goldStream]]: out-of-band feed-captured
    * writes to the source (DV deletes, merges, appends) flow into the
    * mirror on the next batch — it mirrors the TABLE, not the stream.
    */
  def cdcMirrorStream(events: DataFrame, sourcePath: String,
      mirrorPath: String, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val b = batch.dropDuplicates(keys)
        val t = graft.table.MedallionTable(s, sourcePath)
        if (!t.exists) t.overwrite(b)
        else {
          import graft.table.MergeOps._
          val set: Map[String, (ColRef, ColRef) => Column] =
            b.columns.toSeq.map(c =>
              c -> ((_: ColRef, sc: ColRef) => sc(c))).toMap
          t.mergeVectored(b, keys.map(k => k -> k),
            Seq(WhenMatchedUpdate(None, set)),
            Seq(WhenNotMatchedInsert(None, set)))
        }
        t.enableChangeDataFeed() // no-op when already armed
        graft.table.ChangeFeed.replicateTo(t,
          graft.table.MedallionTable(s, mirrorPath), keys)
      }
      .start()

  /** Streaming medallion gold: each micro-batch upserts the fact table,
    * then delta-maintains a grouped gold aggregate
    * ([[graft.table.IncrementalAgg]]) from the fact table's CDC — the gold
    * never rescans the fact table, so per-batch cost is O(batch ⋈ fact
    * partitions touched) for the merge plus O(batch)+O(groups) for the
    * refresh.
    *
    * Exactly-once EFFECT without trusting foreachBatch's delivery: the
    * gold table carries the FACT COMMIT ORDINAL it reflects in a constant
    * `_fact_commit` column — atomic with the gold content because both
    * land in one table swap. Every batch refreshes from
    * `changesSinceOrdinal(reflected)`, i.e. "whatever happened to the fact
    * since the state I reflect", NOT "this batch's rows". A replayed batch
    * re-merges idempotently and the recomputed diff is exactly the part
    * the gold has not absorbed yet — nothing double-counts, nothing is
    * lost, even if the stream crashed between the merge and the gold
    * swap. The same property makes the gold SELF-HEALING: an out-of-band
    * writer to the fact table is picked up by the next batch's refresh.
    *
    * `retainVersions` on the fact table must cover the deepest replay
    * window (snapshots archive per rewrite; the refresh needs the state at
    * the reflected ordinal to still be reconstructible). The default of 3
    * covers a crash-replay plus one out-of-band rewrite. Retention is a
    * property of the WRITING HANDLE, not the table: out-of-band writers
    * must open the fact table with at least this retention, or their
    * rewrite prunes the snapshot the next refresh diffs against.
    */
  def goldStream(rows: DataFrame, factPath: String, goldPath: String,
      keys: Seq[String], groupCols: Seq[String],
      sums: Seq[(String, org.apache.spark.sql.Column)], checkpoint: String,
      retainVersions: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.table.{IncrementalAgg, MedallionTable}
        val s = batch.sparkSession
        val fact = MedallionTable(s, factPath, retainVersions = retainVersions)
        val gold = MedallionTable(s, goldPath)
        // An empty-gold edge (first batch empty / gold lost) makes catchUp
        // bootstrap with a full compute — same self-heal as a stale gold.
        if (!fact.exists) fact.overwrite(batch)
        else fact.merge(batch, keys, deleteNotMatchedBySource = false)
        IncrementalAgg.catchUp(fact, gold, keys, groupCols, sums)
      }
      .start()

  /** Streaming MATERIALIZED JOIN view: each micro-batch upserts the fact
    * table, then delta-maintains the persisted fact⋈dim view
    * ([[graft.table.IncrementalJoin.catchUp]]) from the fact's CDC — the
    * view never recomputes the join; per-batch cost is the fact merge
    * plus the partition-pruned repair (O(batch)). Replay-safe and
    * self-healing on the same ordinal-bookkeeping argument as
    * [[goldStream]] (see catchUp's scaladoc for why the sibling-file
    * stamp needs no atomicity). The dim is re-resolved per batch, so
    * between-batch dim updates flow into NEW rows; retroactive dim
    * repair of existing view rows is
    * [[graft.table.IncrementalJoin.applyDimChanges]], run on the dim's
    * own (rare) change cadence.
    */
  def joinStream(rows: DataFrame, factPath: String, dimPath: String,
      viewPath: String, keys: Seq[String], on: Seq[(String, String)],
      checkpoint: String, viewPartitionColumns: Seq[String] = Nil,
      retainVersions: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.table.{IncrementalJoin, MedallionTable}
        val s = batch.sparkSession
        val fact = MedallionTable(s, factPath, retainVersions = retainVersions)
        val mv = MedallionTable(s, viewPath,
          partitionColumns = viewPartitionColumns)
        if (!fact.exists) fact.overwrite(batch)
        else fact.merge(batch, keys, deleteNotMatchedBySource = false)
        IncrementalJoin.catchUp(fact, MedallionTable(s, dimPath).read, mv,
          keys, on)
      }
      .start()

  /** Stream-static enrichment join: the static side is re-resolved per
    * micro-batch (picking up dim-table updates between batches) and, being
    * small, broadcast — the standard streaming fact⋈dim shape. Works
    * unchanged on batch frames.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")
      .drop(dim(dimKey))

  /** Stream-stream interval join: each click pairs with views of the same
    * user within `windowMinutes` BEFORE the click. Both sides carry
    * watermarks so the join state is bounded: a buffered view can be
    * dropped once the click watermark passes its interval end.
    */
  def clicksWithRecentViews(events: DataFrame,
      watermark: String = "10 minutes", windowMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Streaming file-source ingestion — the streaming twin of the bronze
    * stage: new files landing in `srcDir` are discovered incrementally
    * (checkpointed file index) and landed into a partitioned table.
    * `Trigger.AvailableNow` drains everything currently available and
    * stops — the batch-cadence deployment mode (cron-started catch-up runs
    * with streaming's bookkeeping instead of hand-rolled file tracking).
    *
    * Exactly-once EFFECT under replay: foreachBatch alone is at-least-once
    * (a crash between the table write and the offset commit replays the
    * batch), so each batch writes its rows under its own
    * `ingest_batch_id` partition via dynamic partition overwrite — a
    * replayed batch overwrites its own partition instead of duplicating
    * rows. The standard idempotent-foreachBatch-sink pattern.
    *
    * Scale notes: file listing is driver-side but incremental (only new
    * entries enter the log); per-batch work is an ordinary distributed
    * read+write. Schema is required up front — streaming sources do not
    * infer (run one batch inference pass at deploy time if needed).
    */
  def fileIngest(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, format: String,
      options: Map[String, String], tablePath: String,
      partitionColumns: Seq[String], checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format(format).schema(schema).options(options).load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("ingest_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy((partitionColumns :+ "ingest_batch_id"): _*)
          .parquet(tablePath)
      }
      .start()

  /** Streams a MedallionTable's APPEND TAIL: every parquet file the table
    * gains after the stream starts arrives as streaming rows — the
    * "table as a stream source" read Delta users wire downstream jobs to.
    * Pure composition: appends land as new parquet files, and Spark's own
    * FileStreamSource discovers new files per micro-batch with
    * checkpointed exactly-once progress, so no custom source is needed;
    * `_graft_meta`/`_`-prefixed paths are already invisible to it (Spark
    * skips hidden dirs). Caveat (spec'd, same as Delta's
    * `ignoreChanges`): rewrite operations (merge/compact/restore) replace
    * files wholesale and would re-emit rows — tail ONLY append-workload
    * tables, the medallion bronze shape.
    */
  def tableTail(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(tablePath)

  /** Streaming incremental dedup — [[graft.dedup.StandingDedupIndex]]'s
    * check-then-ingest protocol lifted to Structured Streaming: each
    * micro-batch of documents is deduplicated against the standing index
    * AS WRITTEN BY ALL PRIOR BATCHES, its per-doc report (doc_id,
    * is_exact_dup, n_candidates) is appended to a report table, and its
    * own keys are then ingested. The report write lands BEFORE the
    * ingest (check() is lazy; writing materializes it), so a batch never
    * counts itself — the same ordering the batch query
    * (`dedup_index_persisted`) pins.
    *
    * Scale shape: state lives in the index TABLES, not the streaming
    * state store — unbounded corpus growth lands on disk as 16-64 B/row
    * appends while executor state stays O(1); each micro-batch pays
    * index-vs-batch equi-joins, never a corpus scan (the batch is
    * persisted across its ~5 passes so the source is read once).
    *
    * Exactly-once EFFECT under replay (the fileIngest recipe): index
    * rows are tagged with the batch id and check() EXCLUDES its own
    * tag, so a replayed batch — one that ingested and then crashed
    * before the checkpoint commit — re-checks against exactly the
    * pre-ingest index and reproduces its original report, which then
    * overwrites its own `ingest_batch_id` partition via dynamic
    * partition overwrite; the re-ingest appends duplicate index rows,
    * harmless by construction (membership joins + DISTINCT candidates).
    *
    * Compaction interplay: only compact the index through tags whose
    * micro-batches the CHECKPOINT has committed. A compacted tag's rows
    * live in the archive and can no longer be excluded, so a replay of
    * an uncommitted-but-compacted batch fails fast in check() (by
    * design — its exactly-once report would otherwise silently corrupt)
    * rather than report every doc as its own duplicate.
    */
  def dedupStream(docs: DataFrame, indexPath: String, reportPath: String,
      bandKeys: DataFrame => DataFrame, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          val idx = new graft.dedup.StandingDedupIndex(
            b.sparkSession, indexPath, bandKeys)
          idx.check(b, excludeTag = Some(batchId))
            .withColumn("ingest_batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch_id")
            .parquet(reportPath)
          idx.ingest(b, tag = batchId)
        } finally b.unpersist()
      }
      .start()

  /** One micro-batch of the streaming curation funnel — package-private so
    * the replay spec can re-invoke a batch the way a recovering
    * foreachBatch sink would. Stages mirror the batch funnel
    * (`pipeline_llm_curate`): stateless quality gate → standing-index
    * dedup check (excluding this batch's own tag, so a replay reproduces
    * the original decisions) → curated rows land by OVERWRITING the
    * batch's own `ingest_batch_id` partition (dynamic partition
    * overwrite: at-least-once delivery, exactly-once curated contents) →
    * index ingest last (duplicate-tolerant by the dedup-index contract).
    */
  private[graft] def curateBatch(batch: DataFrame, batchId: Long,
      indexPath: String, curatedPath: String,
      bandKeys: DataFrame => DataFrame, qualityPass: Column,
      decontIndexPath: Option[String] = None): Unit = {
    val b = batch.persist()
    // The derived `quality` frame — gate + decont join — is what every
    // downstream consumer re-evaluates (dedup check, curated write,
    // index ingest); caching only the RAW batch left the decont join
    // running three times per micro-batch (ProfileStanding: ~72 jobs on
    // the two-batch scenario). Persist the derived frame instead.
    val gated = b.filter(qualityPass)
    val quality = (decontIndexPath match {
      case Some(dp) =>
        val dec = new graft.text.DecontaminationIndex(b.sparkSession, dp)
        gated.join(
          dec.check(gated).filter(!col("contaminated")).select("doc_id"),
          Seq("doc_id"))
      case None => gated
    }).persist()
    try {
      val idx = new graft.dedup.StandingDedupIndex(
        b.sparkSession, indexPath, bandKeys)
      // checkAndIngest: ONE shared signature computation serves the
      // replay-idempotent check, the curated write (the `between` stage —
      // same ordering contract as before: write after the report, ingest
      // last), and the single-commit ingest — the funnel's former
      // per-batch double text-hashing (SCALING.md round 16)
      idx.checkAndIngest(quality, batchId) { report =>
        // static per-batch partition path, not dynamic partition
        // overwrite: a micro-batch writes exactly ONE partition (its own
        // batch id), so the dynamic mode's staging-and-swap machinery
        // buys nothing and costs a commit round per write (ProfileCurate
        // phase table, SCALING.md round 14); overwriting the batch's own
        // directory is the same exactly-once replay contract
        quality.join(
            report.filter(!col("is_exact_dup"))
              .select(col("doc_id"), col("n_candidates")),
            Seq("doc_id"))
          .write.mode("overwrite")
          .parquet(s"$curatedPath/ingest_batch_id=$batchId")
      }
      ()
    } finally { quality.unpersist(); b.unpersist() }
  }

  /** Streaming curation funnel — the batch `pipeline_llm_curate` stages
    * lifted to Structured Streaming: per micro-batch, quality-gate the
    * docs (stateless Column predicate), drop exact duplicates against
    * the standing dedup index AS WRITTEN BY PRIOR BATCHES (near-dup
    * candidates are flagged via `n_candidates`, not dropped — the
    * streaming funnel cannot re-rank a cluster it has already emitted),
    * and append survivors to a curated parquet table, exactly-once under
    * replay: decisions replay via the tag-excluded re-check and the
    * curated write replays via batch-id partition overwrite. With
    * `decontIndexPath` set, docs sharing n-grams with the standing
    * benchmark index ([[graft.text.DecontaminationIndex]]) are dropped
    * between the quality gate and the dedup check (read-only: eval
    * suites ingest there out-of-band). Index maintenance is O(batch);
    * no corpus rescan anywhere.
    */
  def curateStream(docs: DataFrame, indexPath: String, curatedPath: String,
      bandKeys: DataFrame => DataFrame, qualityPass: Column,
      checkpoint: String, decontIndexPath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(batch, batchId, indexPath, curatedPath, bandKeys,
          qualityPass, decontIndexPath)
      }
      .start()

  /** The general exactly-once table sink for foreachBatch: every
    * micro-batch appends through
    * [[graft.table.MedallionTable.appendIdempotent]] with the batch id as
    * the txn version, so an at-least-once replay (restart mid-epoch,
    * speculative re-run) is a NO-OP instead of duplicate rows — the
    * generic form of the bookkeeping [[goldStream]] (commit ordinals) and
    * the index sinks (batch tags) each specialize. `appId` names the
    * stream; two different streams appending to one table keep
    * independent version spaces.
    */
  def idempotentAppendStream(src: DataFrame,
      table: graft.table.MedallionTable, appId: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.appendIdempotent(batch, appId, batchId)
        ()
      }
      .start()

  /** Streaming ANN index maintenance — [[graft.similarity.StandingAnnIndex
    * .ingest]] lifted to Structured Streaming, the vector-side sibling of
    * [[dedupStream]]: each micro-batch of (vec_id, embedding) is assigned
    * to the FROZEN trained centroids (batch × broadcast — a narrow map)
    * and appended to the cell-partitioned vector table tagged
    * `batchId + 1` (tag 0 is the bootstrap build). At-least-once
    * foreachBatch delivery yields an exactly-once index: a replayed batch
    * hits the tag probe (or, after compaction, the watermark) and is
    * skipped. Centroids never retrain in-stream — the retrain cadence is
    * the batch-side [[graft.similarity.StandingAnnIndex.retrain]];
    * executor state stays O(1) while the corpus lands on disk.
    */
  def annIngestStream(vectors: DataFrame, indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        new graft.similarity.StandingAnnIndex(batch.sparkSession, indexPath)
          .ingest(batch, tag = batchId + 1)
      }
      .start()

  /** Streaming BM25-index maintenance: each micro-batch of (doc_id, text)
    * ingests into a standing [[graft.text.StandingBm25Index]] under
    * tag = batchId + 1 (tag 0 is reserved). Exactly-once is STRICTER here
    * than for the ANN/dedup ingests — postings carry counts, so a
    * replayed micro-batch that re-appended would double tf/df — and is
    * delivered by the index's own protocol: the stats-row probe skips a
    * completed tag, and a tag that crashed mid-ingest partition-deletes
    * its partial postings before rewriting. Compaction interplay matches
    * dedupStream's contract: only compact through tags whose
    * micro-batches the checkpoint has committed.
    */
  def bm25IngestStream(docs: DataFrame, indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        new graft.text.StandingBm25Index(batch.sparkSession, indexPath)
          .ingest(batch, tag = batchId + 1)
      }
      .start()

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * once the watermark passes its extent + gap (event-time timeout), so
    * late in-watermark events — including orphans older than the current
    * session, and events bridging two buffered sessions — merge correctly
    * before anything is emitted. One summary row per closed session.
    *
    * On a BATCH frame (no watermark, timeouts never fire) every session is
    * flushed at end-of-group — the group's events are all present.
    */
  def userSessions(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val flushAtEnd = !events.isStreaming

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          def summary(s: SessionState) = SessionSummary(userId, s.n, s.total,
            new Timestamp(s.startMs), new Timestamp(s.lastMs))
          var sessions = state.getOption.map(_.sessions.toList).getOrElse(Nil)
          it.foreach(e => sessions = mergeEvent(sessions, e.ts.getTime, e.value, gapMs))
          if (flushAtEnd) {
            if (state.exists) state.remove()
            sessions.sortBy(_.startMs).map(summary).iterator
          } else {
            // Same path for data and timeout invocations: close what the
            // watermark allows, keep the rest armed on the earliest close.
            val (done, open) =
              splitClosed(sessions, state.getCurrentWatermarkMs(), gapMs)
            if (open.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(SessionBuf(open))
              // +1: the session closes only when wm EXCEEDS lastMs+gap
              // (strict close), so fire the timer at the first closing
              // watermark. Open ⇒ lastMs+gap ≥ wm, so the timestamp is
              // strictly above the watermark — always valid to set.
              state.setTimeoutTimestamp(open.map(_.lastMs).min + gapMs + 1)
            }
            done.sortBy(_.startMs).map(summary).iterator
          }
      }
  }

  /** The same gap sessionizer on Spark 4's `transformWithState` API — the
    * successor to flatMapGroupsWithState: typed `ValueState` from a
    * per-processor handle, EXPLICIT event-time timers (one per session
    * extension; stale timers are recognized and ignored in
    * `handleExpiredTimer`), RocksDB-backed state. Same semantics as
    * [[userSessions]] — the spec drives both and compares.
    */
  class SessionProcessor(gapMs: Long, flushAtEnd: Boolean = false)
      extends StatefulProcessor[Long, Event, SessionSummary] {
    @transient private var buf: ValueState[SessionBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[SessionBuf]("sessions",
        Encoders.product[SessionBuf], TTLConfig.NONE)

    private def summary(userId: Long)(s: SessionState) = SessionSummary(
      userId, s.n, s.total, new Timestamp(s.startMs), new Timestamp(s.lastMs))

    /** Close what the watermark allows, re-arm the earliest remaining
      * close; shared by the data and timer paths (see [[userSessions]]).
      */
    private def drain(userId: Long, sessions: List[SessionState],
        watermarkMs: Long): Iterator[SessionSummary] = {
      val (done, open) = splitClosed(sessions, watermarkMs, gapMs)
      if (open.isEmpty) buf.clear()
      else {
        buf.update(SessionBuf(open))
        // One timer per drain; superseded timers stay registered and are
        // recognized as stale on expiry (cheaper than delete+re-register).
        // +1 mirrors the strict close in splitClosed.
        getHandle.registerTimer(open.map(_.lastMs).min + gapMs + 1)
      }
      done.sortBy(_.startMs).map(summary(userId)).iterator
    }

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionSummary] = {
      var sessions =
        if (buf.exists()) buf.get().sessions.toList else Nil
      rows.foreach(e => sessions = mergeEvent(sessions, e.ts.getTime, e.value, gapMs))
      if (flushAtEnd) { // batch frame: the group's events are all present
        buf.clear()
        sessions.sortBy(_.startMs).map(summary(userId)).iterator
      } else drain(userId, sessions, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionSummary] =
      if (buf.exists())
        drain(userId, buf.get().sessions.toList, tv.getCurrentWatermarkInMs())
      else Iterator.empty // stale timer for an already-drained buffer
  }

  /** [[userSessions]] re-expressed on transformWithState (requires the
    * RocksDB state store provider, see EventStreamsSpec).
    */
  def userSessionsTws(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60L * 1000L, !events.isStreaming),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
