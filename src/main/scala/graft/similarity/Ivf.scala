package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors: the corpus is
  * partitioned into cells around centroids; a query probes only its
  * `nProbe` nearest cells, so the exact cosine is computed against a
  * fraction of the corpus.
  *
  * Centroid choice is deterministic (the lowest-id vectors seed the cells —
  * no RNG, reproducible across runs; swap in k-means iterations without
  * changing the query path). Scale shape: assignment is corpus ×
  * broadcast(centroids) (argmin over a constant number of cells — a narrow
  * map, not a corpus self-join); the probe join is an equi-join on cell id.
  * This and [[Ann]] (LSH) are the two bucketed scale paths over the
  * [[Similarity.bruteForceTopK]] baseline.
  */
object Ivf {

  /** Corpus rows tagged with their nearest-centroid cell. */
  def withCells(emb: DataFrame, nCentroids: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = base.filter($"vec_id" < nCentroids)
      .select($"vec_id".as("cell_id"), $"v".as("cv"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cell_id")
    base.crossJoin(broadcast(centroids))
      .withColumn("sim", call_function("graft_cosine", $"v", $"cv"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"v", $"cell_id")
  }

  /** Approximate top-k: each query probes its `nProbe` nearest cells and
    * ranks candidates within them by exact cosine. Output matches
    * [[Similarity.bruteForceTopK]]'s shape.
    */
  def topK(emb: DataFrame, queryPred: Column, k: Int,
           nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centroids = base.filter($"vec_id" < nCentroids)
      .select($"vec_id".as("cell_id"), $"v".as("cv"))

    val cells = withCells(emb, nCentroids)

    // Each query's nProbe nearest cells.
    val wProbe = Window.partitionBy($"query_id").orderBy($"sim".desc, $"cell_id")
    val probes = base.filter(queryPred)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", call_function("graft_cosine", $"qv", $"cv"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nProbe)
      .select($"query_id", $"qv", $"cell_id")

    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    cells.select($"vec_id".as("neighbor_id"), $"v".as("nv"), $"cell_id")
      .join(probes, Seq("cell_id"))
      .filter($"neighbor_id" =!= $"query_id")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", call_function("graft_cosine", $"qv", $"nv"))
      .withColumn("rank", row_number().over(wRank))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank")
  }
}
