package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: the corpus is
  * partitioned into cells around centroids; a query probes only its
  * `nProbe` nearest cells, so the exact cosine is computed against a
  * fraction of the corpus.
  *
  * Centroids: deterministic seeds (the lowest-id vectors — no RNG,
  * reproducible) refined by k-means (Lloyd) iterations: assign → per-cell
  * elementwise mean → repeat. Refinement moves centroids to the data's
  * actual cluster structure, tightening cells and raising recall at the
  * same nProbe.
  *
  * Scale shape: assignment is corpus × broadcast(centroids) (argmin over a
  * constant number of cells — a narrow map, not a corpus self-join); the
  * mean update is one posexplode + aggregation per iteration, reduced to
  * |cells|×dims rows; the probe join is an equi-join on cell id. Centroids
  * are materialized per iteration (localCheckpoint) so the final query
  * plan doesn't re-run earlier iterations. This and [[Ann]] (LSH) are the
  * two bucketed scale paths over the [[Similarity.bruteForceTopK]]
  * baseline.
  */
object Ivf {

  private[similarity] def prepared(emb: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def seedCentroids(base: DataFrame, nCentroids: Int): DataFrame =
    base.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"))

  /** Nearest-centroid assignment: (vec_id, v, cell_id). Argmin as a hash
    * aggregate (`max_by` over (sim, -cell_id) — same tiebreak as ordering
    * by sim desc, cell_id asc), not a sort-window: one partial-aggregating
    * shuffle instead of a full sort of corpus × centroids rows.
    */
  private[similarity] def assignCells(base: DataFrame, centroids: DataFrame): DataFrame =
    base.crossJoin(broadcast(centroids))
      .withColumn("sim", call_function("graft_cosine", col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(named_struct('v', v, 'cell_id', cell_id), " +
        "named_struct('sim', sim, 'neg_cell', -cell_id))").as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.cell_id").as("cell_id"))

  /** Lloyd iterations from the deterministic seeds. A cell that loses all
    * members keeps its previous centroid (standard empty-cluster fallback).
    */
  def refineCentroids(base: DataFrame, nCentroids: Int, iterations: Int): DataFrame = {
    var cents = seedCentroids(base, nCentroids)
    var i = 0
    while (i < iterations) {
      val means = assignCells(base, cents)
        .select(col("cell_id"), posexplode(col("v")).as(Seq("pos", "x")))
        // 1e-6-grid quantized mean: integral sums are exact in any partial-
        // aggregation order, so refined centroids are bit-deterministic
        // across runs (plain avg() drifts in the last ulp with order)
        .groupBy(col("cell_id"), col("pos"))
        .agg((sum(round(col("x") * 1e6)) / count(lit(1)) / 1e6).as("mx"))
        .groupBy(col("cell_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mean_cv"))
      cents = cents.join(means, Seq("cell_id"), "left")
        .select(col("cell_id"), coalesce(col("mean_cv"), col("cv")).as("cv"))
        .localCheckpoint() // |cells| rows; cuts the iterative lineage
      i += 1
    }
    cents
  }

  /** Corpus rows tagged with their (refined-)nearest-centroid cell. */
  def withCells(emb: DataFrame, nCentroids: Int, iterations: Int = 2): DataFrame = {
    val base = prepared(emb)
    assignCells(base, refineCentroids(base, nCentroids, iterations))
  }

  /** Approximate top-k: each query probes its `nProbe` nearest cells and
    * ranks candidates within them by exact cosine. Output matches
    * [[Similarity.bruteForceTopK]]'s shape.
    */
  def topK(emb: DataFrame, queryPred: Column, k: Int,
           nCentroids: Int = 16, nProbe: Int = 2, iterations: Int = 2): DataFrame = {
    val base = prepared(emb)
    val centroids = refineCentroids(base, nCentroids, iterations)
    val cells = assignCells(base, centroids)

    // Each query's nProbe nearest cells.
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell_id"))
    val probes = base.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", call_function("graft_cosine", col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell_id"))

    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cells.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("cell_id"))
      .join(probes, Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", call_function("graft_cosine", col("qv"), col("nv")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
