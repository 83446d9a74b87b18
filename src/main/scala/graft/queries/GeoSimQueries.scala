package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Geo
import graft.similarity.Similarity

/** J7 — the reference's driver-side geodesic nearest-neighbor county
  * assignment (`silver_table_creation.py:246-287`: two collect()s + a Python
  * loop) rewritten Spark-native: crossJoin against the small labeled side +
  * haversine Column + window argmin. No collect() anywhere in the plan —
  * the labeled side broadcasts, so at scale this is a broadcast
  * nested-loop join, not a driver bottleneck.
  *
  * Plus the similarity-search surface over `embeddings.parquet`
  * (brute-force cosine top-k; the LSH-bucketed scale path lives in
  * [[graft.similarity.Ann]]).
  */
object GeoSimQueries {
  import Q.QueryFn

  /** Deterministic synthetic stations derived from nation (FIXTURES.md
    * fixture-role mapping): every 5th station lacks a county label.
    */
  private def stations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir).select(
      $"n_nationkey".as("station_id"),
      (lit(-60.0) + $"n_nationkey" * 4.7).as("lat"),
      (lit(-150.0) + $"n_nationkey" * 11.3).as("lon"),
      when($"n_nationkey" % 5 =!= 0, $"n_regionkey").as("county"))
  }

  val defs: Map[String, QueryFn] = Map(
    "j7_geo_nn_assignment" -> ((s, dir) => {
      import s.implicits._
      val st = stations(s, dir)
      val labeled = st.filter($"county".isNotNull)
      val unlabeled = st.filter($"county".isNull)
        .select($"station_id", $"lat", $"lon")
      val lab = labeled.select($"station_id".as("lid"), $"lat".as("llat"),
        $"lon".as("llon"), $"county")
      val dist = Geo.haversineKm($"lat", $"lon", $"llat", $"llon")
      val w = Window.partitionBy($"station_id").orderBy($"dist", $"county", $"lid")
      val assigned = unlabeled.crossJoin(broadcast(lab))
        .withColumn("dist", dist)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"station_id", $"county".as("assigned_county"))
      assigned.union(labeled.select($"station_id", $"county".as("assigned_county")))
    }),

    // Brute-force cosine top-k over embeddings: the correctness baseline for
    // ANN. Queries broadcast; norms precomputed per row (not per pair).
    "sim_topk_bruteforce" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), queryPred = col("vec_id") < 8, k = 5))
  )

  val oracles: Map[String, String] = Map(
    "j7_geo_nn_assignment" ->
      ("""WITH st AS (
         |  SELECT n_nationkey AS station_id,
         |         -60.0 + n_nationkey * 4.7 AS lat,
         |         -150.0 + n_nationkey * 11.3 AS lon,
         |         CASE WHEN n_nationkey % 5 <> 0 THEN n_regionkey END AS county
         |  FROM nation),
         |lab AS (SELECT * FROM st WHERE county IS NOT NULL),
         |unl AS (SELECT station_id, lat, lon FROM st WHERE county IS NULL),
         |d AS (
         |  SELECT u.station_id, l.county, l.station_id AS lid,
         |         2 * 6371.0 * asin(sqrt(
         |           pow(sin(radians(l.lat - u.lat) / 2), 2) +
         |           cos(radians(u.lat)) * cos(radians(l.lat)) *
         |           pow(sin(radians(l.lon - u.lon) / 2), 2))) AS dist
         |  FROM unl u CROSS JOIN lab l)
         |SELECT station_id, county AS assigned_county FROM (
         |  SELECT station_id, county,
         |         row_number() OVER (PARTITION BY station_id
         |                            ORDER BY dist, county, lid) AS rn
         |  FROM d) WHERE rn = 1
         |UNION ALL
         |SELECT station_id, county AS assigned_county FROM lab""".stripMargin),
    "sim_topk_bruteforce" ->
      ("""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         CAST(row_number() OVER (
         |           PARTITION BY q.vec_id
         |           ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
         |                    n.vec_id) AS INTEGER) AS rank
         |  FROM embeddings q, embeddings n
         |  WHERE q.vec_id < 8 AND n.vec_id <> q.vec_id)
         |WHERE rank <= 5""".stripMargin)
  )
}
