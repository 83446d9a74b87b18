package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent standing ANN index — the table-maintenance half of the
  * similarity-search story, mirroring [[graft.dedup.StandingDedupIndex]]:
  * two [[graft.table.MedallionTable]]s, a trained centroid table
  * `(cell_id, cv)` and an append-only assignment table
  * `(vec_id, cell_id, v, batch_tag)`.
  *
  * The daily-batch protocol a 100 TB embedding corpus runs:
  * {{{
  *   idx.train(bootstrap, nCentroids)  // once, on a representative sample
  *   idx.ingest(batch, tag)            // per landing: assign to FROZEN
  *                                     // centroids, append — O(batch)
  *   idx.query(qs, k, nProbe)          // reads ONLY the index tables
  * }}}
  * `ingest` never retrains or rescans the corpus: assignment is
  * batch × broadcast(centroids) — a narrow map — and the append is
  * commit-marked like every MedallionTable write. `query` probes each
  * query's `nProbe` nearest cells and rescores candidates by exact
  * cosine, so it reads ~nProbe/nCells of the assignment table via the
  * cell_id equi-join, never all of it — and because the vector table is
  * PARTITIONED by `cell_id`, the probe statically prunes the scan to the
  * probed cells' directories (spec-asserted in
  * StandingIndexPruningSpec). Frozen
  * centroids drift from the data distribution as batches accumulate —
  * re-`train` periodically (the standard IVF re-index cadence);
  * assignments rebuild in one pass.
  *
  * Two storage modes share the protocol: the RAW side ([[train]] /
  * [[ingest]] / [[query]]) keeps vectors as d doubles per row and
  * rescores by exact cosine; the PQ side ([[trainPq]] / [[ingestPq]] /
  * [[queryPq]]) keeps m small integer codes per vector ([[Pq]] — the
  * memory end of the curve, ~32× smaller at m=8, dims=64) and rescores
  * by ADC. At 100 TB the two compose: IVF cells bound the candidate set,
  * PQ codes bound the bytes per candidate (`sim_ivfpq_topk` demonstrates
  * the composition on the non-persisted path).
  */
final class StandingAnnIndex(spark: SparkSession, basePath: String) {

  /** Trained centroids (cell_id, cv) — overwritten only by [[train]]. */
  val centroidTable = graft.table.MedallionTable(spark, s"$basePath/centroids")

  /** Append-only assignments (vec_id, v, batch_tag) partitioned by
    * `cell_id`: [[query]]'s probe narrows to the probed cells' directories
    * (static partition pruning — see the isin filter there), so the scan
    * cost is ~nProbe/nCells of the table in FILES, not just rows.
    */
  val vectorTable = graft.table.MedallionTable(spark, s"$basePath/vectors",
    partitionColumns = Seq("cell_id"))

  /** Train centroids on a bootstrap corpus (k-means from deterministic
    * seeds, [[Ivf.refineCentroids]]) and (re)build the assignment table
    * for it. Tag 0 marks bootstrap rows.
    */
  def train(bootstrap: DataFrame, nCentroids: Int, iterations: Int = 2): Unit = {
    val base = Ivf.prepared(bootstrap)
    val cents = Ivf.refineCentroids(base, nCentroids, iterations)
    centroidTable.overwrite(cents)
    vectorTable.overwrite(clusterForWrite(
      Ivf.assignCells(base, cents).withColumn("batch_tag", lit(0L))))
    recordOccupancy()
  }

  /** Train-time per-cell occupancy histogram `(cell_id, count,
    * trained_max_tag)` — the drift monitor's reference distribution,
    * refreshed by [[train]]/[[retrain]] from the assignments they just
    * built. Centroid-sized (≤ nCentroids rows).
    */
  val occupancyTable = graft.table.MedallionTable(spark, s"$basePath/occupancy")

  private def recordOccupancy(): Unit = {
    val assigns = vectorTable.read
    val maxTag = assigns.agg(max(col("batch_tag"))).head().getLong(0)
    occupancyTable.overwrite(assigns.groupBy("cell_id").count()
      .withColumn("trained_max_tag", lit(maxTag)))
  }

  /** Occupancy-skew drift score in [0, 1]: total-variation distance
    * between the train-time per-cell distribution and the distribution
    * of the vectors ingested SINCE training. Frozen centroids that no
    * longer fit the data misassign new vectors — same-cluster neighbors
    * scatter across cells, so the new mass lands in cells the training
    * distribution didn't favor and the TV distance grows; stationary
    * ingests reproduce the train-time shape and stay near 0 (sampling
    * noise only). Cost: one column-pruned `(cell_id, batch_tag)`
    * aggregation over the assignment table plus a centroid-sized
    * snapshot read — cheap enough to run after every ingest. 0.0 when
    * nothing has been ingested since training.
    */
  def driftScore(): Double = {
    if (!occupancyTable.exists) return 0.0
    val occ = graft.table.SmallSnapshot.read(occupancyTable).collect()
    if (occ.isEmpty) return 0.0
    val trainedThrough = occ.head.getAs[Long]("trained_max_tag")
    val trainCounts = occ.map(r =>
      r.getAs[Number]("cell_id").longValue() -> r.getAs[Long]("count")).toMap
    val newCounts = vectorTable.read
      .filter(col("batch_tag") > trainedThrough)
      .groupBy("cell_id").count().collect()
      .map(r => r.getAs[Number]("cell_id").longValue() -> r.getLong(1)).toMap
    val newTotal = newCounts.values.sum.toDouble
    if (newTotal == 0) return 0.0
    val trainTotal = trainCounts.values.sum.toDouble
    val cells = trainCounts.keySet ++ newCounts.keySet
    cells.toSeq.map { c =>
      math.abs(newCounts.getOrElse(c, 0L) / newTotal -
        trainCounts.getOrElse(c, 0L) / trainTotal)
    }.sum / 2.0
  }

  /** The retrain trigger the standing cadence needs: true when the
    * post-train ingest distribution has drifted past `threshold` TV
    * distance from the train-time occupancy ([[driftScore]]).
    * StandingIndexRetrainSpec shows it firing on the drift scenario
    * (measured score 0.38) and staying quiet on stationary ingests
    * (0.09), so the default sits between the two regimes with margin.
    */
  def retrainDue(threshold: Double = 0.25): Boolean =
    driftScore() >= threshold

  /** Cluster rows by cell before a partitioned write: without this, every
    * write task holding rows of k cells emits k files, so a 32-task write
    * into 32 cells can scatter ~1000 small files; clustered, each cell's
    * rows land in one task → one file per cell per write.
    */
  private def clusterForWrite(df: DataFrame): DataFrame =
    df.repartition(col("cell_id"))

  /** Assign `batch` (vec_id, embedding) to the frozen centroids and
    * append. Idempotent per `tag`: a replayed batch (at-least-once
    * foreachBatch delivery) that already landed is skipped, so the index
    * never double-counts a vector. The vector table is partitioned by
    * cell_id (the QUERY probe key — the hotter path), so the tag probe
    * here stays a column-pruned min/max-skippable scan of the tiny
    * batch_tag column rather than a directory listing; the PQ code table,
    * whose only selective read IS the tag probe, partitions by batch_tag
    * instead.
    */
  def ingest(batch: DataFrame, tag: Long): Unit = {
    require(tag != 0L, "tag 0 is reserved for the bootstrap build")
    if (vectorTable.exists &&
        !vectorTable.read.filter(col("batch_tag") === tag).isEmpty) return
    vectorTable.append(clusterForWrite(
      Ivf.assignCells(Ivf.prepared(batch), graft.table.SmallSnapshot.read(centroidTable))
        .withColumn("batch_tag", lit(tag))))
  }

  /** Periodic re-index: re-train centroids on the CURRENT persisted
    * corpus (not the original bootstrap) and rebuild every assignment in
    * one pass, preserving each row's batch_tag. This is the standard IVF
    * re-train cadence the class scaladoc promises: frozen centroids
    * drift from the data distribution as ingested batches move away from
    * the bootstrap's clusters, recall at fixed nProbe decays, and a
    * retrain recovers it (measured in StandingIndexRetrainSpec and
    * SCALING.md). Safe against reading-from-self: MedallionTable
    * overwrite stages the rewrite beside the table and swaps after the
    * job, so the build reads the pre-swap files. At 100 TB, train on
    * `sampleFraction` < 1 — k-means only needs a representative sample —
    * while the one-pass reassignment still covers every row.
    */
  def retrain(nCentroids: Int, iterations: Int = 2,
      sampleFraction: Double = 1.0): Unit = {
    val current = vectorTable.read
      .select(col("vec_id"), col("v").cast("array<double>").as("v"),
        col("batch_tag"))
    val base = current.select(col("vec_id"), col("v"))
    // the deterministic seed rows (vec_id < nCentroids) must survive the
    // sample or refineCentroids would start from fewer than n seeds
    val trainSet =
      if (sampleFraction >= 1.0) base
      else base.filter(col("vec_id") < nCentroids).unionByName(
        base.filter(col("vec_id") >= nCentroids)
          .sample(withReplacement = false, sampleFraction, seed = 7L))
    val cents = Ivf.refineCentroids(trainSet, nCentroids, iterations)
    centroidTable.overwrite(cents)
    vectorTable.overwrite(clusterForWrite(
      Ivf.assignCells(base, cents)
        .join(current.select(col("vec_id"), col("batch_tag")), Seq("vec_id"))))
    recordOccupancy()
  }

  // ---- PQ side: m small integer codes per vector instead of d doubles —
  // the 100 TB memory story (~32× smaller at m=8, dims=64). Same
  // freeze/ingest/query protocol: codebooks train once on the bootstrap,
  // ingests encode against them frozen, queries run ADC against the
  // persisted code table only.

  /** Trained PQ codebooks (sub_id, code, cv) — overwritten only by
    * [[trainPq]].
    */
  val codebookTable = graft.table.MedallionTable(spark, s"$basePath/codebooks")

  /** Append-only PQ codes (vec_id, sub_id, code) partitioned by
    * `batch_tag`: [[ingestPq]]'s tag-idempotence probe prunes to one
    * directory instead of scanning every prior batch's codes.
    */
  val codeTable = graft.table.MedallionTable(spark, s"$basePath/codes",
    partitionColumns = Seq("batch_tag"))

  def trainPq(bootstrap: DataFrame, m: Int = 8, kCent: Int = 16,
      iterations: Int = 1): Unit = {
    val base = Ivf.prepared(bootstrap)
    val d = Pq.dimsPerSub(bootstrap, m)
    val subs = Pq.subRows(base, m, d)
    val books = Pq.trainCodebooks(subs, kCent, iterations)
    codebookTable.overwrite(books)
    codeTable.overwrite(Pq.assignCodes(subs, books)
      .select(col("vec_id"), col("sub_id"), col("code"))
      .withColumn("batch_tag", lit(0L)))
  }

  /** Encode `batch` against the frozen codebooks and append — O(batch),
    * tag-idempotent like [[ingest]].
    */
  def ingestPq(batch: DataFrame, tag: Long): Unit = {
    require(tag != 0L, "tag 0 is reserved for the bootstrap build")
    // at or below the code table's compaction watermark = known-ingested
    // (partition folded into the archive) — replay must stay a no-op
    if (tag <= graft.table.TagArchive.watermark(spark, basePath, "codes"))
      return
    if (codeTable.exists &&
        !codeTable.read.filter(col("batch_tag") === tag).isEmpty) return
    val books = graft.table.SmallSnapshot.read(codebookTable)
    val (m, d) = bookShape(books)
    codeTable.append(
      Pq.assignCodes(Pq.subRows(Ivf.prepared(batch), m, d), books)
        .select(col("vec_id"), col("sub_id"), col("code"))
        .withColumn("batch_tag", lit(tag)))
  }

  /** Fold every `batch_tag ≤ w` partition of the PQ code table into the
    * archive partition — the code table's only selective read is the
    * ingest tag probe, so after a year of daily tags the compaction
    * collapses ~365 directories to archive + recent without changing
    * [[queryPq]] results (ADC scans all codes regardless of partition).
    *
    * NOT via [[graft.table.TagArchive.archiveThrough]]'s append-then-
    * delete fold: a crash between those steps leaves duplicate rows —
    * harmless for the dedup index's membership joins, CORRUPTING here
    * because ADC SUMS a vector's per-subvector rows (a duplicated code
    * row doubles its distance contribution and mis-ranks it), and
    * re-running the append-first fold would bake the duplicates into the
    * archive permanently. Same discipline as
    * [[graft.text.StandingBm25Index.compactThrough]]: watermark FIRST
    * (a watermarked tag skips [[ingestPq]] whether or not its partition
    * has folded), then ONE atomic staged-swap overwrite that remaps the
    * tags — any crash leaves either the old or the new complete state,
    * and re-running converges.
    */
  def compactCodesThrough(w: Long, nFiles: Int = 4): Unit = {
    val arch = graft.table.TagArchive.ArchiveTag
    require(w != arch, "cannot archive the archive partition itself")
    if (!codeTable.exists || codeTable.read
        .filter(col("batch_tag") <= w && col("batch_tag") =!= arch)
        .isEmpty) return
    if (w > graft.table.TagArchive.watermark(spark, basePath, "codes"))
      graft.table.TagArchive.setWatermark(spark, basePath, w, "codes")
    codeTable.overwrite(codeTable.read
      .withColumn("batch_tag",
        when(col("batch_tag") <= w, lit(arch)).otherwise(col("batch_tag")))
      .repartition(nFiles, col("batch_tag")))
  }

  // ---- IVFADC side: the composition billion-vector production systems
  // run — IVF cells bound the candidate set, PQ codes over CELL RESIDUALS
  // bound the bytes per candidate — persisted with both training
  // artifacts frozen. `sim_ivfpq_topk` demonstrates the math on the
  // self-contained path; this is its standing-table form. NOTE: the
  // IVFADC mode owns this index path's centroid AND codebook tables
  // (codebooks here quantize residuals, not raw vectors) — do not mix
  // with [[trainPq]] on the same basePath.

  /** Append-only IVFADC rows (vec_id, sub_id, code, batch_tag)
    * partitioned by `cell_id`: [[queryIvfPq]] statically prunes to the
    * probed cells' directories AND moves only integer codes — the two
    * 100 TB bounds (candidates, bytes) in one layout.
    */
  val adcTable = graft.table.MedallionTable(spark, s"$basePath/adc",
    partitionColumns = Seq("cell_id"))

  def trainIvfPq(bootstrap: DataFrame, nCells: Int = 16, m: Int = 8,
      kCent: Int = 16, ivfIterations: Int = 2, pqIterations: Int = 1): Unit = {
    val base = Ivf.prepared(bootstrap)
    val d = Pq.dimsPerSub(bootstrap, m)
    val cents = Ivf.refineCentroids(base, nCells, ivfIterations)
    centroidTable.overwrite(cents)
    val cells = Ivf.assignCells(base, cents)
    val resid = cells.join(broadcast(cents), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    // cell_id CARRIES through the explode + argmin (functionally dependent
    // on vec_id — same groups), so no corpus-sized re-join recovers it
    // (the IvfPq.topK round-12 lesson, applied to the standing writes)
    val subs = Pq.subRows(resid, m, d, carry = Seq("cell_id"))
    val books = Pq.trainCodebooks(subs, kCent, pqIterations)
    codebookTable.overwrite(books)
    adcTable.overwrite(clusterForWrite(
      Pq.assignCodes(subs, books, carry = Seq("cell_id"))
        .select(col("vec_id"), col("sub_id"), col("code"), col("cell_id"))
        .withColumn("batch_tag", lit(0L))))
  }

  /** Periodic IVFADC re-index: unlike the raw mode's [[retrain]], the
    * code table is NOT invertible (that is the memory win), so the
    * caller supplies the current corpus `(vec_id, embedding)` — at scale
    * the source lakehouse table the ingests came from. Centroids and
    * residual codebooks re-fit, every code row rebuilds in one pass, and
    * each vector keeps its previously-recorded batch_tag (vectors the
    * index has not seen land as tag 0), so tag-idempotent replay keeps
    * working against the rebuilt table.
    */
  def retrainIvfPq(corpus: DataFrame, nCells: Int = 16, m: Int = 8,
      kCent: Int = 16, ivfIterations: Int = 2, pqIterations: Int = 1): Unit = {
    // safe against reading-from-self like [[retrain]]: the overwrite
    // stages beside the table and swaps after the job, so this scan
    // reads the pre-swap files
    val oldTags = adcTable.read.select(col("vec_id"), col("batch_tag")).distinct()
    val base = Ivf.prepared(corpus)
    val d = Pq.dimsPerSub(corpus, m)
    val cents = Ivf.refineCentroids(base, nCells, ivfIterations)
    centroidTable.overwrite(cents)
    val cells = Ivf.assignCells(base, cents)
    val resid = cells.join(broadcast(cents), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    // cell_id carried through explode + argmin (see trainIvfPq); only the
    // tag-recovery join remains — it reads a DIFFERENT table (old codes)
    val subs = Pq.subRows(resid, m, d, carry = Seq("cell_id"))
    val books = Pq.trainCodebooks(subs, kCent, pqIterations)
    codebookTable.overwrite(books)
    adcTable.overwrite(clusterForWrite(
      Pq.assignCodes(subs, books, carry = Seq("cell_id"))
        .select(col("vec_id"), col("sub_id"), col("code"), col("cell_id"))
        .join(oldTags, Seq("vec_id"), "left")
        .withColumn("batch_tag", coalesce(col("batch_tag"), lit(0L)))))
  }

  /** Assign `batch` to the frozen centroids, encode the cell residuals
    * against the frozen codebooks, append — O(batch), tag-idempotent
    * like [[ingest]].
    */
  def ingestIvfPq(batch: DataFrame, tag: Long): Unit = {
    require(tag != 0L, "tag 0 is reserved for the bootstrap build")
    if (tag <= graft.table.TagArchive.watermark(spark, basePath, "adc")) return
    if (adcTable.exists &&
        !adcTable.read.filter(col("batch_tag") === tag).isEmpty) return
    val cents = graft.table.SmallSnapshot.read(centroidTable)
    val books = graft.table.SmallSnapshot.read(codebookTable)
    val (m, d) = bookShape(books)
    val base = Ivf.prepared(batch)
    val resid = Ivf.assignCells(base, cents)
      .join(broadcast(cents), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    // cell_id carried through explode + argmin (see trainIvfPq): the
    // O(batch) encode stays a single narrow pass, no batch-sized re-join
    adcTable.append(clusterForWrite(
      Pq.assignCodes(Pq.subRows(resid, m, d, carry = Seq("cell_id")), books,
          carry = Seq("cell_id"))
        .select(col("vec_id"), col("sub_id"), col("code"), col("cell_id"))
        .withColumn("batch_tag", lit(tag))))
  }

  /** IVFADC top-k against the persisted tables ([[IvfPq.topK]]
    * semantics: per-probed-cell residual LUTs, micro-rounded integer ADC,
    * self excluded). The corpus side is the cell_id-partitioned code
    * table statically pruned to the probed cells — nProbe/nCells of the
    * corpus in FILES, integer codes in bytes.
    */
  def queryIvfPq(queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val cents = graft.table.SmallSnapshot.read(centroidTable)
    val books = graft.table.SmallSnapshot.read(codebookTable)
    val (m, d) = bookShape(books)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", call_function("graft_cosine", col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cell_id"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qrv"))
    val lut = probes
      .select(col("query_id"), col("cell_id"),
        expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
          s"s -> NAMED_STRUCT('sub_id', s, 'qv', SLICE(qrv, s * $d + 1, $d))))").as("e"))
      .select(col("query_id"), col("cell_id"),
        col("e.sub_id").as("sub_id"), col("e.qv").as("qv"))
      .join(broadcast(books), Seq("sub_id"))
      .select(col("query_id"), col("cell_id"), col("sub_id"), col("code"),
        round(Pq.l2sq(col("qv"), col("cv")) * 1e6).cast("long").as("dist_micro"))
    // probed-cell set ≤ nCells values — parameter-bounded, same class as
    // the centroid broadcast; the isin is STATIC partition pruning
    val probedCells = probes.select(col("cell_id")).distinct()
      .collect().map(_.get(0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro").asc, col("neighbor_id"))
    adcTable.read
      .filter(col("cell_id").isin(probedCells.toIndexedSeq: _*))
      .select(col("vec_id").as("neighbor_id"), col("cell_id"),
        col("sub_id"), col("code"))
      .join(broadcast(lut), Seq("cell_id", "sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist_micro")).as("adist_micro"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** ADC top-k against the persisted code table ([[Pq.topK]] semantics:
    * micro-rounded integer distances, self excluded). The corpus side of
    * the join moves only (vec_id, sub_id, code) integer rows.
    */
  def queryPq(queries: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val books = graft.table.SmallSnapshot.read(codebookTable)
    val (m, d) = bookShape(books)
    val lut = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("query_id"),
        expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
          s"s -> NAMED_STRUCT('sub_id', s, 'qv', SLICE(v, s * $d + 1, $d))))").as("e"))
      .select(col("query_id"), col("e.sub_id").as("sub_id"), col("e.qv").as("qv"))
      .join(broadcast(books), Seq("sub_id"))
      .select(col("query_id"), col("sub_id"), col("code"),
        round(Pq.l2sq(col("qv"), col("cv")) * 1e6).cast("long").as("dist_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro").asc, col("neighbor_id"))
    codeTable.read
      .select(col("vec_id").as("neighbor_id"), col("sub_id"), col("code"))
      .join(broadcast(lut), Seq("sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist_micro")).as("adist_micro"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** (m, dims-per-subspace) off the codebook table — ONE metadata-bounded
    * driver read. `books` is a [[graft.table.SmallSnapshot]] frame, so the
    * projected collect is a LocalTableScan `executeCollect` (zero Spark
    * jobs). The collect is UNCONDITIONAL: it is bounded by the codebook
    * being m×2^codeBits rows (every caller passes a SmallSnapshot
    * codebook); a non-small caller would collect its whole frame.
    */
  private def bookShape(books: DataFrame): (Int, Int) = {
    val rows = books.select(col("sub_id").cast("long"), size(col("cv"))).collect()
    require(rows.nonEmpty, "empty codebook table")
    val m = rows.iterator.map(_.getLong(0)).max.toInt + 1
    (m, rows.head.getInt(1))
  }

  /** Approximate top-k for `queries` (vec_id, embedding) against the
    * standing index. Output shape matches [[Similarity.bruteForceTopK]]:
    * (query_id, neighbor_id, rank). Self-matches are excluded by id.
    */
  def query(queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val cents = graft.table.SmallSnapshot.read(centroidTable)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", call_function("graft_cosine", col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id"))

    // The probed-cell set is ≤ nCells values (centroids are broadcast-
    // bounded by construction), so collecting it is parameter-sized —
    // same class as the centroid broadcast itself. The isin filter turns
    // the probe into STATIC partition pruning on the cell_id-partitioned
    // vector table: the scan lists only the probed cells' directories.
    val probedCells = probes.select(col("cell_id")).distinct()
      .collect().map(_.get(0))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    vectorTable.read
      .filter(col("cell_id").isin(probedCells.toIndexedSeq: _*))
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("cell_id"))
      .join(probes, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", call_function("graft_cosine", col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
