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
        Tables.embeddings(s, dir), queryPred = col("vec_id") < 8, k = 5)),

    // Retrieval evaluation metrics — the harness a curation/retrieval
    // stack is tuned against: per query, reciprocal rank, DCG@5 and
    // nDCG@5 with RELEVANCE = label match (the embeddings fixture's
    // label column — non-degenerate ground truth, unlike planted
    // copies). All metric terms micro-round BEFORE their sums
    // (order-independent, engine-comparable); nDCG divides the two
    // micro-integers at the end. Scale shapes: ranked lists come from
    // the oracled brute-force kernel (scale swaps in the ANN paths —
    // same output shape); label joins are equi-joins; IDCG explodes a
    // ≤5-element sequence per query.
    "eval_retrieval_metrics" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val top = Similarity.bruteForceTopK(emb, col("vec_id") < 8, k = 5)
      val qlab = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"label".as("qlabel"))
      val nlab = emb.select($"vec_id".as("neighbor_id"), $"label".as("nlabel"))
      val judged = top.join(broadcast(qlab), Seq("query_id"))
        .join(nlab, Seq("neighbor_id"))
        .withColumn("is_rel", $"nlabel" === $"qlabel")
      val perQ = judged.groupBy($"query_id").agg(
        sum(when($"is_rel", 1L).otherwise(0L)).as("n_rel_retrieved"),
        min(when($"is_rel", $"rank")).as("frr"),
        sum(when($"is_rel",
            round(lit(1000000.0) / log2($"rank" + 1)).cast("long"))
          .otherwise(0L)).as("dcg_micro"))
      val rcount = qlab
        .join(emb.select($"vec_id", $"label".as("nlabel")),
          $"nlabel" === $"qlabel" && $"vec_id" =!= $"query_id")
        .groupBy($"query_id").agg(count(lit(1)).as("r"))
      val idcg = rcount
        .select($"query_id",
          explode(sequence(lit(1), least($"r", lit(5)))).as("i"))
        .groupBy($"query_id")
        .agg(sum(round(lit(1000000.0) / log2($"i" + 1)).cast("long"))
          .as("idcg_micro"))
      perQ.join(idcg, Seq("query_id"), "left")
        .select($"query_id",
          $"n_rel_retrieved",
          coalesce(round(lit(1000000.0) / $"frr").cast("long"), lit(0L))
            .as("rr_micro"),
          $"dcg_micro",
          coalesce($"idcg_micro", lit(0L)).as("idcg_micro"),
          when(coalesce($"idcg_micro", lit(0L)) > 0,
              round(lit(1000000.0) * $"dcg_micro" / $"idcg_micro").cast("long"))
            .otherwise(0L).as("ndcg_micro"))
    })
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
    "eval_retrieval_metrics" ->
      ("""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |  FROM embeddings WHERE vec_id < 8),
         |top5 AS (
         |  SELECT * FROM (
         |    SELECT q.query_id, q.qlabel, n.vec_id AS neighbor_id,
         |           n.label AS nlabel,
         |           CAST(row_number() OVER (
         |             PARTITION BY q.query_id
         |             ORDER BY list_cosine_similarity(q.qv, n.embedding) DESC,
         |                      n.vec_id) AS INTEGER) AS rank
         |    FROM embeddings n, q WHERE n.vec_id <> q.query_id)
         |  WHERE rank <= 5),
         |per_q AS (
         |  SELECT query_id,
         |         CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_rel_retrieved,
         |         MIN(CASE WHEN nlabel = qlabel THEN rank END) AS frr,
         |         CAST(SUM(CASE WHEN nlabel = qlabel
         |           THEN CAST(ROUND(1000000 / log2(rank + 1)) AS BIGINT)
         |           ELSE 0 END) AS BIGINT) AS dcg_micro
         |  FROM top5 GROUP BY 1),
         |rcount AS (
         |  SELECT q.query_id, COUNT(*) AS r
         |  FROM q JOIN embeddings e
         |    ON e.label = q.qlabel AND e.vec_id <> q.query_id
         |  GROUP BY 1),
         |idcg AS (
         |  SELECT query_id,
         |         CAST(SUM(CAST(ROUND(1000000 / log2(i + 1)) AS BIGINT))
         |              AS BIGINT) AS idcg_micro
         |  FROM (SELECT query_id, unnest(range(1, least(r, 5) + 1)) AS i
         |        FROM rcount)
         |  GROUP BY 1)
         |SELECT p.query_id, p.n_rel_retrieved,
         |       COALESCE(CAST(ROUND(1000000.0 / frr) AS BIGINT), 0) AS rr_micro,
         |       p.dcg_micro,
         |       COALESCE(i.idcg_micro, 0) AS idcg_micro,
         |       CASE WHEN COALESCE(i.idcg_micro, 0) > 0
         |            THEN CAST(ROUND(1000000.0 * p.dcg_micro / i.idcg_micro)
         |                      AS BIGINT)
         |            ELSE 0 END AS ndcg_micro
         |FROM per_q p LEFT JOIN idcg i ON p.query_id = i.query_id""".stripMargin),
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
