package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): cluster the corpus with k-means, compare
  * pairs only WITHIN a cluster, and drop every vector that has a
  * sufficiently-cosine-similar cluster-mate with a smaller id (greedy
  * keep-lowest-id — one survivor per duplicate chain, deterministic).
  *
  * This is the embedding-space complement of the text-hash dedup family
  * (MinHash/SimHash catch near-identical TEXT; SemDeDup catches
  * paraphrases and re-renderings whose embeddings nearly coincide).
  *
  * Scale shape (the paper's own argument): clustering bounds the
  * quadratic. The within-cell self-join is an equi-join on `cell_id` —
  * cost Σ|cell|², so with `nCentroids` grown proportionally to the
  * corpus the per-cell population stays constant and total work stays
  * linear. Centroid assignment is corpus × broadcast(centroids) (narrow
  * map, [[Ivf.withCells]]); nothing in the plan is all-pairs across
  * cells. At 100 TB: nCentroids ~ N / desired-cell-size (paper uses
  * ~100k clusters for web corpora).
  */
object SemDeDup {

  /** Per-vector keep/drop decisions: `(vec_id, cell_id, dup_of, keep)`.
    * `dup_of` is the smallest-id cluster-mate with cosine ≥ `tau` (NULL
    * for survivors); `keep = dup_of IS NULL`. Deterministic end-to-end:
    * the k-means seeds/refinement are deterministic ([[Ivf]]) and the
    * drop rule is a pure min.
    */
  def decisions(emb: DataFrame, nCentroids: Int, iterations: Int = 2,
      tau: Double = 0.9): DataFrame = {
    val cells = Ivf.withCells(emb, nCentroids, iterations)
    // The self-pair (other_id == vec_id) anchors every vector through the
    // inner join, so no left-outer join-back onto `cells` is needed — the
    // corpus is assigned to cells twice in the plan, not three times. The
    // cosine is evaluated inside the `when`, i.e. only on true pairs.
    cells.select(col("cell_id"), col("vec_id"), col("v"))
      .join(cells.select(col("cell_id"), col("vec_id").as("other_id"),
        col("v").as("ov")), Seq("cell_id"))
      .filter(col("other_id") <= col("vec_id"))
      .groupBy(col("vec_id"), col("cell_id"))
      .agg(min(when(col("other_id") < col("vec_id") &&
        call_function("graft_cosine", col("v"), col("ov")) >= lit(tau),
        col("other_id"))).as("dup_of"))
      .withColumn("keep", col("dup_of").isNull)
      .select(col("vec_id"), col("cell_id"), col("dup_of"), col("keep"))
  }

  /** The deduplicated corpus: input rows whose decision was `keep`. */
  def dedup(emb: DataFrame, nCentroids: Int, iterations: Int = 2,
      tau: Double = 0.9): DataFrame =
    emb.join(decisions(emb, nCentroids, iterations, tau)
      .filter(col("keep")).select(col("vec_id")), Seq("vec_id"))
}
