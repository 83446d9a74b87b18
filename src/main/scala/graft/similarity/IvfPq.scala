package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ composite index (Jegou et al. 2011 §IV: "IVFADC") — the shape
  * production ANN systems run at billion-vector scale: an IVF coarse
  * quantizer narrows each query to `nProbe` cells, and within cells the
  * RESIDUAL vectors (v − centroid) are product-quantized, so the search
  * touches m-byte codes of a corpus fraction instead of raw floats of
  * everything. Residual quantization is what makes the composite beat
  * [[Pq]] alone: residuals concentrate near zero, so the same m×k
  * codebook resolves them with far less quantization error.
  *
  * Composition is entirely the existing building blocks: [[Ivf]]'s
  * deterministic centroids/assignment, [[Pq]]'s joint codebook training,
  * encoding, and micro-rounded integer ADC. Scale shapes inherited:
  * centroids and codebooks broadcast (m×k and |cells| rows); the corpus
  * appears as (cell_id, sub_id, code) integer rows; the ADC join keys on
  * (cell_id, sub_id, code) so only PROBED cells' codes join each query's
  * LUT — the candidate fan-in is nProbe/|cells| of the corpus, and
  * nothing re-reads the vectors after encoding.
  */
object IvfPq {

  /** Approximate top-k, [[Similarity.bruteForceTopK]] output shape:
    * (query_id, neighbor_id, rank). Ranked by micro-rounded integer ADC
    * distance asc, neighbor_id asc; self excluded.
    *
    * An exact duplicate of a query vector assigns to the SAME cell
    * (deterministic argmax), leaves the same residual, encodes to the
    * same argmin codes, and the query's own cell is always its top
    * probe — so the copy attains the minimum ADC distance among probed
    * candidates and must rank top-1: the `sim_ivfpq_xcheck` invariant.
    *
    * NOTE (bench readers): this trains centroids AND codebooks inside the
    * query — deliberate, so the oracle demo is self-contained — which is
    * most of `sim_ivfpq_topk`'s wall time. The production path persists
    * both and amortizes training across batches:
    * [[StandingAnnIndex.trainPq]] / [[StandingAnnIndex.queryPq]]
    * (benched as `sim_standing_pq`).
    */
  def topK(emb: DataFrame, queryPred: Column, k: Int,
           nCells: Int = 16, nProbe: Int = 2, m: Int = 8, kCent: Int = 16,
           ivfIterations: Int = 2, pqIterations: Int = 1): DataFrame = {
    val base = Ivf.prepared(emb)
    val d = Pq.dimsPerSub(emb, m)
    val cents = Ivf.refineCentroids(base, nCells, ivfIterations)
    val cells = Ivf.assignCells(base, cents) // (vec_id, v, cell_id)

    // Residuals via a broadcast equi-join on cell_id (|cells| rows).
    val resid = cells.join(broadcast(cents), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))

    // One joint residual codebook shared across cells (IVFADC's layout —
    // per-cell codebooks would broadcast |cells|·m×k rows for no recall
    // win at this residual spread). The exploded subvectors CARRY
    // cell_id through encoding, removing the plan's one corpus×corpus
    // shuffle join (codes re-joined onto resid for cell recovery) —
    // ~0.4 s at bench scale per ProfileAnnXcheck; the dominant costs are
    // the training passes (refineCentroids ~1.0 s, trainCodebooks
    // ~1.4 s warm), which the bench row bounds via ivfIterations and the
    // production path amortizes ([[StandingAnnIndex]]).
    val subs = resid.select(col("vec_id"), col("cell_id"),
      expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
        s"s -> NAMED_STRUCT('sub_id', s, 'sv', SLICE(v, s * $d + 1, $d))))").as("e"))
      .select(col("vec_id"), col("cell_id"),
        col("e.sub_id").as("sub_id"), col("e.sv").as("sv"))
    val books = Pq.trainCodebooks(subs, kCent, pqIterations)
    val codes = Pq.assignCodes(subs, books, carry = Seq("cell_id"))
      .select(col("vec_id").as("neighbor_id"), col("cell_id"),
        col("sub_id"), col("code"))

    // Each query probes its nProbe nearest cells ([[Ivf.topK]]'s rule)
    // and carries the PER-CELL residual q − centroid(cell): ADC distances
    // are computed in each probed cell's own residual frame.
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", call_function("graft_cosine", col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cell_id"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qrv"))

    // Per-(query, probed cell) m×k LUT of micro-rounded subspace
    // distances — integer summands, order-independent ranking keys.
    val lut = probes
      .select(col("query_id"), col("cell_id"),
        expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
          s"s -> NAMED_STRUCT('sub_id', s, 'qv', SLICE(qrv, s * $d + 1, $d))))").as("e"))
      .select(col("query_id"), col("cell_id"),
        col("e.sub_id").as("sub_id"), col("e.qv").as("qv"))
      .join(broadcast(books), Seq("sub_id"))
      .select(col("query_id"), col("cell_id"), col("sub_id"), col("code"),
        round(Pq.l2sq(col("qv"), col("cv")) * 1e6).cast("long").as("dist_micro"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro").asc, col("neighbor_id"))
    codes.join(broadcast(lut), Seq("cell_id", "sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist_micro")).as("adist_micro"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Sub-phase wall attribution of the IVFADC pipeline for the round-12
    * bench investigation (graft.tools.ProfileAnnXcheck) — diagnostic
    * only; findings recorded in SCALING.md.
    */
  private[graft] def profileBreakdown(emb: DataFrame,
      time: (String, () => Any) => Any): Unit = {
    val m = 8; val kCent = 16
    val base = Ivf.prepared(emb)
    val d = Pq.dimsPerSub(emb, m)
    var cents: DataFrame = null
    time("  ivfpq: refineCentroids(2)", () => {
      cents = Ivf.refineCentroids(base, 16, 2).localCheckpoint()
    })
    val cells = Ivf.assignCells(base, cents)
    val resid = cells.join(broadcast(cents), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
    val subs = resid.select(col("vec_id"), col("cell_id"),
      expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
        s"s -> NAMED_STRUCT('sub_id', s, 'sv', SLICE(v, s * $d + 1, $d))))").as("e"))
      .select(col("vec_id"), col("cell_id"),
        col("e.sub_id").as("sub_id"), col("e.sv").as("sv"))
    time("  ivfpq: subs count", () => subs.count())
    var books: DataFrame = null
    time("  ivfpq: trainCodebooks(1)", () => {
      books = Pq.trainCodebooks(subs, kCent, 1).localCheckpoint()
    })
    time("  ivfpq: assignCodes count", () =>
      Pq.assignCodes(subs, books, carry = Seq("cell_id")).count())
  }
}
