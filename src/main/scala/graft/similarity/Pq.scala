package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jegou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): each vector splits into `m` contiguous
  * subspaces and a small per-subspace codebook (k centroids, the same
  * deterministic k-means recipe as [[Ivf]]) quantizes each subvector to
  * one small code — the corpus compresses to m codes per vector. This is
  * the MEMORY-side ANN scale path: at 100 TB an IVF cell list holds PQ
  * codes (m bytes/vector), not raw floats (4·dims bytes), an ~32×
  * shrink at m=8, dims=64.
  *
  * Search is ADC (asymmetric distance computation): a query builds an
  * m×k lookup table of exact subspace distances to every centroid once,
  * and a corpus vector's approximate distance is the SUM of m table
  * lookups over its codes — zero corpus-side float math.
  *
  * Scale shapes: codebooks are m×k rows (broadcast); encoding is
  * corpus × broadcast argmin (narrow map shape, one partial-agg shuffle
  * keyed by vec_id); the ADC scoring is an equi-join of the exploded
  * code column store with the broadcast per-query lookup tables on
  * (sub_id, code) — |corpus|·m skinny integer rows, never the vectors
  * themselves. Subspace distances go through the codegen'd `graft_dot`
  * kernel (HOF lambdas are interpreted — the measured SURVEY.md lesson)
  * and are micro-rounded BEFORE the per-neighbor sum, so ranking keys
  * are integer accumulations: independent of summation order, stable
  * across runs and partitionings.
  */
object Pq {

  private def prepared(emb: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  /** The corpus exploded into m subvectors: (vec_id, [carry...,] sub_id,
    * sv). The TRANSFORM materializes all m slices from ONE pass over the
    * row before Generate fans them out. `carry` columns (functionally
    * dependent on vec_id, e.g. IVFADC's cell_id) ride the explode so
    * downstream [[assignCodes]] keeps them for free — recovering them by
    * re-joining a corpus-sized frame afterwards costs a shuffle join
    * (the round-12 sim_ivfpq_topk attribution).
    */
  private[similarity] def subRows(base: DataFrame, m: Int, d: Int,
      carry: Seq[String] = Nil): DataFrame =
    base.select(Seq(col("vec_id")) ++ carry.map(col) :+
      expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
        s"s -> NAMED_STRUCT('sub_id', s, 'sv', SLICE(v, s * $d + 1, $d))))").as("e"): _*)
      .select(Seq(col("vec_id")) ++ carry.map(col) ++
        Seq(col("e.sub_id").as("sub_id"), col("e.sv").as("sv")): _*)

  /** Squared L2 via three codegen'd dot products: |a-b|² = a·a + b·b − 2a·b. */
  private[similarity] def l2sq(a: Column, b: Column): Column =
    call_function("graft_dot", a, a) + call_function("graft_dot", b, b) -
      lit(2.0) * call_function("graft_dot", a, b)

  /** Per-(vector, subspace) nearest codebook entry: (vec_id, sub_id, sv,
    * code). Argmin as a hash aggregate (min_by over (dist, code) — ties
    * to the lowest code id), not a sort-window: one partial-aggregating
    * shuffle instead of a full sort of corpus × k rows.
    */
  private[similarity] def assignCodes(subs: DataFrame, books: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    // `carry`: extra per-vector columns (functionally dependent on
    // vec_id, e.g. IvfPq's cell_id) kept through the argmin aggregate —
    // carrying them here is free (same groups), while recovering them by
    // re-joining corpus-sized frames afterwards costs a shuffle join
    // (the round-12 sim_ivfpq_topk attribution).
    subs.join(broadcast(books), Seq("sub_id"))
      .withColumn("dist", l2sq(col("sv"), col("cv")))
      .groupBy((Seq("vec_id", "sub_id") ++ carry).map(col): _*)
      .agg(expr("min_by(named_struct('sv', sv, 'code', code), " +
        "named_struct('dist', dist, 'code', code))").as("best"))
      .select((Seq(col("vec_id"), col("sub_id")) ++ carry.map(col) :+
        col("best.sv").as("sv") :+ col("best.code").as("code")): _*)

  /** (sub_id, code, cv): all m codebooks trained JOINTLY in one
    * DataFrame keyed by (sub_id, code). Seeds = the subvectors of the k
    * lowest-id vectors (no RNG, reproducible); Lloyd refinement uses the
    * 1e-6-grid quantized mean of [[Ivf]] so centroids are
    * bit-deterministic under any partial-aggregation order; an emptied
    * code keeps its previous centroid (standard fallback).
    */
  def trainCodebooks(subs: DataFrame, k: Int, iterations: Int): DataFrame = {
    // Seed = the subvectors of the k LOWEST OBSERVED vec_ids, not
    // `vec_id < k` (round-8 advice: that assumed ids dense from 0 — a
    // corpus whose ids start above k, or with gaps, would train fewer or
    // zero centroids and topK would silently return empty). orderBy+limit
    // is TakeOrderedAndProject (distributed, no full sort); the ≤k-row
    // collect is parameter-bounded (k ≈ 16), the same class as the dims
    // probe. Codes = rank within the seed list, dense 0..k-1 under any
    // id distribution.
    // null ids are excluded explicitly: under asc ordering a null sorts
    // first, would be picked as a seed, and `map()` rejects null keys at
    // runtime (round-9 advice)
    val seedIds = subs.filter(col("vec_id").isNotNull)
      .select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k).collect().map(_.get(0))
    require(seedIds.nonEmpty, "PQ codebook training requires a non-empty corpus")
    val codeOf = map(seedIds.zipWithIndex.flatMap { case (id, i) =>
      Seq(lit(id), lit(i)) }.toIndexedSeq: _*)
    var books = subs.filter(col("vec_id").isin(seedIds: _*))
      .select(col("sub_id"), element_at(codeOf, col("vec_id")).cast("int").as("code"),
        col("sv").as("cv"))
    var i = 0
    while (i < iterations) {
      val means = assignCodes(subs, books)
        .select(col("sub_id"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub_id"), col("code"), col("pos"))
        .agg((sum(round(col("x") * 1e6)) / count(lit(1)) / 1e6).as("mx"))
        .groupBy(col("sub_id"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mean_cv"))
      books = books.join(means, Seq("sub_id", "code"), "left")
        .select(col("sub_id"), col("code"),
          coalesce(col("mean_cv"), col("cv")).as("cv"))
        .localCheckpoint() // m×k rows; cuts the iterative lineage
      i += 1
    }
    books
  }

  /** The PQ-encoded corpus: (vec_id, sub_id, code) — the column-store
    * form the ADC join consumes; m integer codes per vector.
    */
  def encode(emb: DataFrame, m: Int = 8, k: Int = 16,
             iterations: Int = 1): DataFrame = {
    val base = prepared(emb)
    val d = dimsPerSub(emb, m)
    val subs = subRows(base, m, d)
    assignCodes(subs, trainCodebooks(subs, k, iterations))
      .select(col("vec_id"), col("sub_id"), col("code"))
  }

  private[similarity] def dimsPerSub(emb: DataFrame, m: Int): Int = {
    // one metadata-bounded row: the fixture schema fixes dims per table
    val probe = emb.select(size(col("embedding"))).limit(1).collect()
    require(probe.nonEmpty, "PQ requires a non-empty corpus (no vectors to probe dims from)")
    val dims = probe.head.getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    dims / m
  }

  /** ADC approximate top-k, [[Similarity.bruteForceTopK]] output shape:
    * (query_id, neighbor_id, rank); ranked by micro-rounded integer ADC
    * distance asc, neighbor_id asc; self excluded. An exact duplicate of
    * a query vector encodes to the query's own argmin codes, so its ADC
    * distance is the attainable MINIMUM — the invariant
    * `sim_pq_xcheck` pins against the oracle.
    */
  def topK(emb: DataFrame, queryPred: Column, k: Int, m: Int = 8,
           kCent: Int = 16, iterations: Int = 1): DataFrame = {
    val base = prepared(emb)
    val d = dimsPerSub(emb, m)
    val subs = subRows(base, m, d)
    val books = trainCodebooks(subs, kCent, iterations)
    val codes = assignCodes(subs, books)
      .select(col("vec_id").as("neighbor_id"), col("sub_id"), col("code"))
    // Per-query m×k lookup table of micro-rounded subspace distances —
    // integer summands make the final ranking key order-independent.
    val lut = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v"))
      .select(col("query_id"),
        expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
          s"s -> NAMED_STRUCT('sub_id', s, 'qv', SLICE(v, s * $d + 1, $d))))").as("e"))
      .select(col("query_id"), col("e.sub_id").as("sub_id"), col("e.qv").as("qv"))
      .join(broadcast(books), Seq("sub_id"))
      .select(col("query_id"), col("sub_id"), col("code"),
        (round(l2sq(col("qv"), col("cv")) * 1e6)).cast("long").as("dist_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro").asc, col("neighbor_id"))
    codes.join(broadcast(lut), Seq("sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("dist_micro")).as("adist_micro"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
