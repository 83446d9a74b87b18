package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`), Spark-first:
  * all math is `Column` composition of codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs, no driver-side loops.
  *
  * Two tiers (the brief's ANN requirement):
  *   - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast;
  *     cost is |queries| × |corpus| — the correctness baseline, and fine
  *     whenever the query set is small.
  *   - [[Ann]] (LSH-bucketed): corpus and queries are hashed into
  *     random-hyperplane band buckets and only bucket-mates are compared —
  *     the 100 TB path: a shuffle on bucket keys instead of a cross join.
  */
object Similarity {

  /** Elementwise dot product in double precision, sequential list order
    * (deterministic; matches the DuckDB oracle's accumulation order).
    *
    * Column-expression form: fine when the pair count is modest (top-k with
    * a small query set, LSH bucket candidates). Spark evaluates HOF lambdas
    * interpreted — and unrolling to element_at chains trades that for Janino
    * compile blow-ups — so the dense all-pairs hot path uses the
    * [[allPairsAboveThreshold]] mapPartitions kernel instead.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** All pairs (idA < idB) with cosine ≥ threshold — the exact-dedup
    * baseline. Dense numeric kernel: the corpus matrix is broadcast once
    * and each partition scans its rows against it with primitive-array
    * loops (the MLlib broadcast-KNN shape) — no per-pair expression
    * evaluation, no boxing. Accumulation is in index order, bit-identical
    * to the Column/DuckDB formulation.
    *
    * Contract: the corpus must fit in executor memory (it is broadcast) —
    * exact all-pairs is inherently bounded; the unbounded scale path is
    * [[Ann]]'s LSH bucketing.
    */
  def allPairsAboveThreshold(emb: DataFrame, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
    val corpus = spark.sparkContext.broadcast(
      rows.collect().sortBy(_._1)) // deterministic order; bounded by contract
    rows.mapPartitions { it =>
      val mat = corpus.value
      def nrm(v: Array[Double]): Double = {
        var s = 0.0; var k = 0
        while (k < v.length) { s += v(k) * v(k); k += 1 }
        math.sqrt(s)
      }
      it.flatMap { case (idA, va) =>
        val na = nrm(va)
        mat.iterator.filter(_._1 > idA).flatMap { case (idB, vb) =>
          var d = 0.0; var k = 0
          while (k < va.length) { d += va(k) * vb(k); k += 1 }
          if (d / (na * nrm(vb)) >= threshold) Some((idA, idB)) else None
        }
      }
    }.toDF("id_a", "id_b")
  }

  /** Exact top-k neighbors by cosine for rows matching `queryPred`.
    * Output: (query_id, neighbor_id, rank). Norms are computed once per row
    * before the join, not per pair.
    */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q = base.filter(queryPred)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val n = base.select($"vec_id".as("neighbor_id"), $"v".as("nv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    n.crossJoin(broadcast(q))
      .filter($"neighbor_id" =!= $"query_id")
      // native codegen'd Catalyst expression (graft.functions.CosineSimilarity)
      .withColumn("cos", call_function("graft_cosine", $"qv", $"nv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank")
  }
}

/** Random-hyperplane LSH for approximate nearest neighbors: sign-bit
  * signatures, banded into buckets; only vectors sharing a band bucket are
  * compared. Deterministic planes from a fixed seed.
  *
  * Scale shape: signature computation is a narrow map; candidate generation
  * is an equi-join (shuffle on band-bucket key) — never an all-pairs cross
  * join. Recall tunes with numPlanes/bands (see AnnSpec for the measured
  * recall-vs-brute-force bound).
  */
object Ann {
  /** Fixed ±1 hyperplane components, seeded — same planes every run. */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Adds a `sig` bitmask column: bit p = (v · plane_p >= 0). */
  def withSignature(df: DataFrame, vecCol: String, numPlanes: Int, dim: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val sig = planes(numPlanes, dim).zipWithIndex.map { case (p, i) =>
      val d = aggregate(zip_with(v, typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("sig", sig)
  }

  /** Explodes the signature into (band_idx, band_val) bucket keys. */
  def withBands(df: DataFrame, numPlanes: Int, bands: Int): DataFrame = {
    val bits = numPlanes / bands
    val mask = (1L << bits) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        shiftright(col("sig"), b * bits).bitwiseAND(lit(mask)).as("band_val"))
    }
    df.withColumn("band", explode(array(bandCols: _*)))
      .withColumn("band_idx", col("band.band_idx"))
      .withColumn("band_val", col("band.band_val"))
      .drop("band")
  }

  /** Approximate top-k: candidates share ≥1 band bucket with the query;
    * exact cosine is computed only on candidates. Output matches
    * [[Similarity.bruteForceTopK]]'s shape.
    */
  def topK(emb: DataFrame, queryPred: Column, k: Int,
           numPlanes: Int = 16, bands: Int = 4, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = withSignature(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      "v", numPlanes, dim)
    val banded = withBands(base, numPlanes, bands)
    val q = banded.filter(queryPred).select($"vec_id".as("query_id"),
      $"v".as("qv"), $"band_idx", $"band_val")
    val n = banded.select($"vec_id".as("neighbor_id"), $"v".as("nv"),
      $"band_idx", $"band_val")
    val cand = n.join(q, Seq("band_idx", "band_val"))
      .filter($"neighbor_id" =!= $"query_id")
      .select("query_id", "neighbor_id", "qv", "nv")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    cand.withColumn("cos", call_function("graft_cosine", $"qv", $"nv"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank")
  }
}
