package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.table.MedallionTable

/** Structured Streaming SINK into a [[MedallionTable]] — the write-side
  * twin of [[ChangeFeedSourceProvider]], Delta's
  * `df.writeStream.format("delta")` parity:
  *
  * {{{
  *   events.writeStream.format("graft")
  *     .option("path", tableDir)
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * The provider hook lives on [[graft.sources.GraftSqlSource]] (the one
  * `graft` [[DataSourceRegister]] — a second registration under the same
  * short name would make every `format("graft")` lookup ambiguous);
  * [[GraftStreamSink.create]] here is the implementation it delegates to.
  *
  * Exactly-once is the TABLE layer's existing transactional-write
  * machinery, not sink-local state: every micro-batch lands through
  * [[MedallionTable.appendIdempotent]] keyed by (appId, batchId) — the
  * same Delta txnAppId/txnVersion contract the idempotent-foreachBatch
  * pattern uses (`EventStreams` scaladoc), now engine-side so users
  * don't hand-roll it. On restart-replay of a committed epoch the
  * version check skips the batch; a crash BEFORE the table commit
  * replays and lands it once. appId defaults to the query's
  * `checkpointLocation` (stable across restarts by construction —
  * Spark's own replay identity); `txnAppId` overrides it when two
  * queries share a checkpoint dir layout.
  *
  * Append output mode only: a streaming aggregation in update/complete
  * mode emits REVISIONS of earlier rows, which an append-only table
  * write would silently duplicate — refused loudly; route revision
  * streams through foreachBatch + merge (the documented pattern).
  *
  * The micro-batch frame is re-anchored as a plain batch DataFrame over
  * the epoch's executed rows (`queryExecution.toRdd` + the private-API
  * bridge — ForeachBatchSink's own pattern) before the table write:
  * `addBatch` hands a streaming-TAGGED frame whose DataFrame writes
  * refuse outright, and the table layer runs its usual multi-action
  * protocol (constraint gate, identity fill, canonicalization) against
  * the anchored copy. Partitioning comes from the `partitionBy` on the
  * stream writer, like every sink.
  */
object GraftStreamSink {

  /** [[StreamSinkProvider.createSink]] body (see class scaladoc for why
    * the registration itself lives on GraftSqlSource).
    *
    * Replay-identity resolution, in priority order:
    *  1. `txnAppId` — the explicit override, hashed as given.
    *  2. `checkpointLocation` option — QUALIFIED to an absolute URI
    *     before hashing: `ckpt`, `./ckpt` and `file:/…/ckpt` across
    *     restarts are the SAME checkpoint and must replay under the same
    *     appId, so the hash keys the resolved location, never the option
    *     spelling of the day.
    *  3. Neither option (checkpoint supplied via
    *     `spark.sql.streaming.checkpointLocation` conf, which Spark
    *     never surfaces in the sink options) — fall back to the
    *     STREAMING QUERY ID at addBatch time (Delta sink's key):
    *     `StreamingQuery.id` is minted once and persisted in the
    *     checkpoint metadata, so it is stable across restarts by
    *     construction and needs no path spelling at all.
    */
  def create(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val params = parameters.map { case (k, v) => k.toLowerCase -> v }
    require(outputMode == OutputMode.Append(),
      s"graft streaming sink supports Append output mode only (got " +
        s"$outputMode) — update/complete revise earlier rows, which an " +
        "append-only table write would duplicate; use foreachBatch + " +
        "merge for revision streams")
    val path = params.getOrElse("path", throw new IllegalArgumentException(
      "graft streaming sink requires option(\"path\", <table dir>)"))
    // the txn registry keys a FILE by appId (no slashes/newlines) — hash
    // the raw identity to a fixed-width name; deterministic, so restarts
    // land on the same txn record
    def hashed(raw: String): String = "sink-" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // legacy spelling alongside: the hash keyed the RAW option string
    // before it keyed the qualified URI, so a pre-existing checkpoint's
    // txn record lives under the old name — addBatch migrates it on
    // first touch (MedallionTable.migrateTxnRecord) instead of replaying
    // the last committed micro-batch without dedup after an upgrade
    var legacy: Option[String] = None
    val appId: Option[String] = params.get("txnappid").map(hashed)
      .orElse(params.get("checkpointlocation").map { raw =>
        val p = new org.apache.hadoop.fs.Path(raw)
        val fs = p.getFileSystem(
          sqlContext.sparkSession.sessionState.newHadoopConf())
        val u = fs.makeQualified(p).toUri
        // scheme/authority/path rebuilt by hand: a null vs empty
        // authority ("file:/x" vs "file:///x") round-trips differently
        // through URI.toString yet names the same location
        val id = hashed(
          s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}" +
            u.getPath)
        val old = hashed(raw)
        if (old != id) legacy = Some(old)
        id
      })
    val mergeSchema = params.get("mergeschema").exists(_.toBoolean)
    new GraftStreamSink(path, partitionColumns, appId, mergeSchema, legacy)
  }
}

private[graft] final class GraftStreamSink(path: String,
    partitionColumns: Seq[String], appIdOpt: Option[String],
    mergeSchema: Boolean, legacyAppIdOpt: Option[String] = None)
    extends Sink {

  // once-per-sink-instance guard: the migration probe is two fs.exists
  // calls, but addBatch is the per-epoch hot path and the answer never
  // changes after the first epoch
  @volatile private var migrationChecked = false

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // Delta sink parity: an epoch whose frame carries columns the table
    // does not have refuses unless mergeSchema=true opted into sink-side
    // evolution — a silently-evolving sink would let one misrouted
    // upstream field permanently widen a production table. With the
    // option set, the append path's schema union + stash maintenance +
    // upcastBatch enforcement do the evolving (same machinery as batch
    // appends). Missing columns always pass: they read back as typed
    // NULLs through the footer union, exactly like batch appends.
    if (!mergeSchema) {
      val t0 = MedallionTable(spark, path, partitionColumns)
      if (t0.exists) {
        val have = t0.read.schema.fieldNames.map(_.toLowerCase).toSet
        val extra = data.schema.fieldNames
          .filterNot(n => have.contains(n.toLowerCase))
        require(extra.isEmpty, "graft streaming sink: micro-batch adds " +
          s"column(s) ${extra.mkString(", ")} the table at $path does " +
          "not have; set option(\"mergeSchema\", \"true\") to evolve " +
          "the sink table")
      }
    }
    // Query-id fallback (create scaladoc case 3): StreamExecution sets
    // the query id as a local property on the micro-batch thread before
    // every epoch — read it here, where it is guaranteed in scope.
    val appId = appIdOpt.getOrElse {
      val qid = spark.sparkContext.getLocalProperty(
        org.apache.spark.sql.execution.streaming.runtime
          .StreamExecution.QUERY_ID_KEY)
      require(qid != null, "graft streaming sink could not resolve a " +
        "replay identity: no txnAppId/checkpointLocation option and no " +
        "streaming query id on this thread — set option(\"txnAppId\")")
      s"sink-query-$qid"
    }
    // ForeachBatchSink's re-anchor: the incoming frame is streaming-
    // tagged (actions refuse); rebuild it batch-shaped over the epoch's
    // executed rows. `copy()` because unsafe rows are buffer-reused.
    val rdd = data.queryExecution.toRdd.map(_.copy())
    val batch = org.apache.spark.sql.GraftColumnBridge
      .batchDataFrame(spark, rdd, data.schema)
    val t = MedallionTable(spark, path, partitionColumns)
    if (!migrationChecked) {
      // pre-qualified-hash checkpoints recorded their txn high-water
      // under the raw-option-string hash — pull it under the new appId
      // so the first post-upgrade restart still dedups its replay
      legacyAppIdOpt.foreach(old => t.migrateTxnRecord(old, appId))
      migrationChecked = true
    }
    // false = this epoch already committed (restart replay): skipped,
    // exactly-once by the table's recorded txn version
    t.appendIdempotent(batch, appId, batchId)
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
