package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent standing BM25 inverted index — the sparse-retrieval analog
  * of [[graft.similarity.StandingAnnIndex]]: tokenize the corpus ONCE at
  * ingest into a postings table, so a query reads only its terms'
  * postings instead of re-tokenizing 100 TB of text per search (which is
  * what the self-contained `text_bm25_topk` plan would amount to at
  * scale).
  *
  * Layout (both [[graft.table.MedallionTable]]s, commit-marked writes):
  *  - `postings` (doc_id, dl, term, tf, term_bucket, batch_tag),
  *    partitioned by (batch_tag, term_bucket): a query probes only its
  *    terms' hash buckets — directory pruning, same discipline as the
  *    ANN index's cell_id partitions — and replay recovery prunes to the
  *    tag's directories.
  *  - `doc_stats` (n_docs, sum_dl, batch_tag), ONE row per ingested tag,
  *    partitioned by batch_tag: corpus totals reduce to O(tags) rows at
  *    query time, never a corpus scan.
  *
  * Replay protocol — STRICTER than the dedup index's: postings carry
  * counts (tf, df derive from row counts), so a replayed batch must not
  * re-append — duplicates would double scores, not just waste space.
  * `ingest` probes the stats table (written LAST) for the tag: present ⇒
  * strict no-op; absent ⇒ the tag's postings partitions are first
  * partition-deleted (recovering a crash BETWEEN the two appends) and
  * rewritten, then the stats row lands. Either crash window therefore
  * replays to exactly-once counts.
  *
  * BM25 scoring matches `text_bm25_topk` formula-for-formula (Robertson
  * k1=1.2, b=0.75, Lucene idf; contributions micro-rounded BEFORE the
  * per-doc sum, so scores are summation-order-independent): querying the
  * standing index over the full corpus is hash-identical to the direct
  * computation — which is exactly what the driver oracle asserts.
  *
  * Reference: the reference pipeline recomputes every derived table from
  * scratch per run (silver_table_creation.py:43-66); a standing index the
  * ingest maintains incrementally is what makes retrieval O(query), not
  * O(corpus), at 100 TB.
  */
final class StandingBm25Index(
    spark: SparkSession,
    basePath: String,
    nBuckets: Int = 16) {

  val postings = graft.table.MedallionTable(spark, s"$basePath/postings",
    partitionColumns = Seq("batch_tag", "term_bucket"))

  val docStats = graft.table.MedallionTable(spark, s"$basePath/doc_stats",
    partitionColumns = Seq("batch_tag"))

  /** Lowercased whitespace tokens + document length, the `text_bm25_topk`
    * tokenizer (dl counts ALL tokens, matching the direct plan's SIZE
    * before any filtering).
    */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id",
        s"TRANSFORM(${TextOps.tokensExpr("text")}, t -> LOWER(t)) AS toks")
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))

  private def bucketOf(term: Column): Column =
    pmod(xxhash64(term), lit(nBuckets)).cast("int")

  /** Ingest `docs` (doc_id, text) under `tag`. Exactly-once under replay:
    * see the class scaladoc's protocol. Tag 0 is reserved (it would
    * collide with "never ingested" probes in operational tooling).
    */
  def ingest(docs: DataFrame, tag: Long): Unit = {
    require(tag != 0L, "tag 0 is reserved")
    require(tag != graft.table.TagArchive.ArchiveTag,
      "the archive tag is reserved for compaction")
    // at or below the compaction watermark = known-ingested even though
    // the tag's stats row was folded into the archive row — replaying it
    // must stay a no-op, not a double count
    if (tag <= graft.table.TagArchive.watermark(spark, basePath, "bm25"))
      return
    if (docStats.exists &&
        !docStats.read.filter(col("batch_tag") === tag).isEmpty) return
    // crash recovery: a prior attempt may have landed some or all of this
    // tag's postings before dying short of the stats row — partition-
    // delete them (directory-level: the predicate is partition-only)
    if (postings.exists) postings.delete(col("batch_tag") === tag)
    val toks = tokenized(docs)
    postings.append(
      toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .withColumn("term_bucket", bucketOf(col("term")))
        .withColumn("batch_tag", lit(tag)))
    docStats.append(
      toks.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
        .withColumn("batch_tag", lit(tag)))
  }

  /** Fold every `batch_tag ≤ w` partition into the archive partition, the
    * [[graft.table.TagArchive]] cadence — but NOT via its append-then-
    * delete fold: a crash between those steps leaves duplicate rows,
    * harmless for the dedup/ANN indexes' membership semantics and
    * CORRUPTING here (tf/df/totals are counts). Each table instead folds
    * by ATOMIC staged-swap overwrite (postings remap their tag, stats
    * rows ≤ w sum into one archive row — query results are invariant
    * under both), and the watermark advances FIRST: any crash then leaves
    * a replay-safe state (a watermarked tag skips ingest whether or not
    * its partition has folded yet), and re-running compactThrough
    * converges. Queries never filter on batch_tag, so compaction is
    * invisible to them; the term_bucket partitioning — the layout the
    * probe pruning needs — survives the fold.
    */
  def compactThrough(w: Long): Unit = {
    val arch = graft.table.TagArchive.ArchiveTag
    require(w != arch, "cannot archive the archive partition itself")
    if (!docStats.exists ||
        docStats.read.filter(col("batch_tag") <= w &&
          col("batch_tag") =!= arch).isEmpty) return
    if (w > graft.table.TagArchive.watermark(spark, basePath, "bm25"))
      graft.table.TagArchive.setWatermark(spark, basePath, w, "bm25")
    postings.overwrite(postings.read
      .withColumn("batch_tag",
        when(col("batch_tag") <= w, lit(arch)).otherwise(col("batch_tag")))
      .repartition(col("batch_tag"), col("term_bucket")))
    val cur = docStats.read
    val folded = cur.filter(col("batch_tag") <= w)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .withColumn("batch_tag", lit(arch))
    docStats.overwrite(cur.filter(col("batch_tag") > w).unionByName(folded))
  }

  /** BM25 top-k for `terms` over everything ingested so far: probes only
    * the terms' `term_bucket` directories (static isin pruning), reduces
    * corpus totals from the O(tags) stats rows, scores with the shared
    * micro-rounded formula, and takes the global top-k via orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, no global sort).
    * Output (doc_id, score_micro), the `text_bm25_topk` shape.
    */
  def query(terms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val lowered = terms.map(_.toLowerCase)
    // resolve the probe buckets with the SAME engine hash used at write
    // (a driver-side reimplementation of xxhash64 could drift): one tiny
    // local job over |terms| rows — parameter-bounded, like the ANN
    // index's centroid reads
    val buckets = lowered.toDF("term")
      .select(bucketOf(col("term")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val totals = docStats.read
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .collect()(0)
    val nDocs = totals.getLong(0)
    val sumDl = totals.getLong(1)
    val probed = postings.read
      .filter(col("term_bucket").isin(buckets: _*))
      .filter(col("term").isin(lowered: _*))
    val dfx = probed.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = expr(
      "CAST(ROUND(LN(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * " +
        "(tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / " +
        "(CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000) AS BIGINT)")
    probed.join(broadcast(dfx), Seq("term"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("sum_dl", lit(sumDl))
      .withColumn("cm", contrib)
      .groupBy("doc_id").agg(sum(col("cm")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id")).limit(k)
  }
}
