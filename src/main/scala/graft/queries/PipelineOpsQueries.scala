package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.{MinHash, SimHash}
import graft.multimodal.MultimodalOps
import graft.similarity.{Ann, SemDeDup, Similarity}

/** Queries backed by the LLM-pipeline modules (dedup, ANN, multimodal).
  * SQL-expressible ones carry DuckDB oracles; signature/ANN queries whose
  * hash functions (xxhash64) have no DuckDB twin are registered without an
  * oracle → the driver records the weaker rows-only check, and their
  * semantics are covered by ScalaTest specs with planted duplicates.
  */
object PipelineOpsQueries {
  import Q.QueryFn

  /** Bounded shingle-doc population shared by `ngram_jaccard_pairs` and
    * `dedup_cc_groups` — one definition so the bound/filter can never
    * silently diverge between the pair query and the clustering query.
    */
  private def shingleDocs(s: SparkSession, dir: String, bound: Int) = {
    import s.implicits._
    Tables.documents(s, dir).filter($"doc_id" < bound)
      .filter(MinHash.shingleFilter(col("text")))
      .select($"doc_id", MinHash.shingles(col("text")).as("sh"))
  }

  /** Shared perceptual-dedup pipeline for the media modalities: plant a
    * TRANSFORMED copy of each small-id asset under id+99999 (≡ 0 mod 3,
    * so the asset KIND of the original is preserved) — `mutate` applies
    * the modality's invariance-class edit to the copy's PAYLOAD
    * (gain-shifted audio, re-containered video; identity for stills) —
    * fingerprint through `decode` (a 64-bit hash from DECODED
    * pixels/samples), band 4×16 bits, pair candidates by band equi-join
    * (never asset×asset), Hamming ≤ 2, and emit the planted-truth rows:
    * every mutated copy must STILL pair its original at Hamming 0 — a
    * decode, hashing, banding, pairing, or invariance bug breaks the
    * hash-match. The band self-join re-expands the bounded decode subtree
    * once per side (the sim_semdedup caveat) — acceptable: the planted
    * population is fixed and the full-corpus path is the same band index
    * at any scale.
    */
  private def perceptualPairs(s: SparkSession, dir: String, kindMod: Int,
      decode: org.apache.spark.sql.Dataset[MultimodalOps.Asset] =>
        org.apache.spark.sql.DataFrame,
      mutate: Array[Byte] => Array[Byte] = identity) = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .where("LENGTH(text) >= 1 AND LENGTH(text) = OCTET_LENGTH(text)")
      .select($"doc_id", $"text")
    val assets0 = MultimodalOps.assetsFromDocuments(base)
    val planted = assets0
      .filter(a => a.asset_id % 3 == kindMod && a.asset_id < 60)
      .map(a => a.copy(asset_id = a.asset_id + 99999,
        content = mutate(a.content)))
    val hashes = decode(assets0.union(planted))
      .toDF("asset_id", "fp")
    val bands = hashes.select($"asset_id", $"fp",
      posexplode(array((0 until 4).map(k =>
        shiftright($"fp", k * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bv")))
    val pairs = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bv" === $"b.bv" &&
          $"a.asset_id" < $"b.asset_id")
      .select($"a.asset_id".as("id_a"), $"b.asset_id".as("id_b"),
        $"a.fp".as("ha"), $"b.fp".as("hb"))
      .distinct()
      .filter(expr("bit_count(ha ^ hb) <= 2"))
    // Planted-truth rows, tied STRUCTURALLY to the planting predicate
    // (id_a from the planted originals: < 60 and ≡ kindMod mod 3; id_b its
    // +99999 copy) — an id-delta filter alone could alias a natural
    // doc_id ≥ 99999 as a "copy" on a bigger corpus (round-8 advice).
    pairs.filter($"id_b" - $"id_a" === 99999 &&
        $"id_a" < 60 && $"id_a" % 3 === kindMod && $"id_b" >= 99999)
      .select($"id_a".as("orig_id"), $"id_b".as("copy_id"),
        expr("CAST(bit_count(ha ^ hb) AS INTEGER)").as("hamming"),
        lit(true).as("is_pair"))
  }

  /** All-pairs exact Jaccard over [[shingleDocs]]. */
  private def jaccardPairs(s: SparkSession, dir: String, bound: Int) = {
    import s.implicits._
    val d = shingleDocs(s, dir, bound)
    val a = d.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = d.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b", MinHash.jaccard($"sh_a", $"sh_b").as("jaccard"))
  }

  /** DuckDB twin of [[shingleDocs]] as a CTE body (kept beside the Scala
    * definition for the same single-point-of-change reason).
    */
  private def duckShingleDocsCte(bound: Int): String =
    s"""d AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
       |        FROM documents
       |        WHERE doc_id < $bound AND len(regexp_extract_all(text, '\\S+')) >= 3))""".stripMargin

  /** Hybrid-retrieval fixtures shared verbatim between the Spark query and
    * the DuckDB oracle (the text_bm25_topk discipline: same formula text
    * both sides, contributions micro-rounded BEFORE any sum so scores are
    * summation-order-independent and engine-comparable). Robertson BM25,
    * k1=1.2, b=0.75, Lucene-style idf.
    */
  private val HybridTerms = Seq("spark", "merge", "window")
  private def hybInList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")
  private val HybridBm25Contrib =
    "CAST(ROUND(LN(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * " +
      "(tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / " +
      "(CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000) AS BIGINT)"

  /** Shared by `sim_hybrid_rrf` (self-contained arms) and
    * `sim_hybrid_standing` (both arms served from persisted standing
    * indexes): the standing paths must reproduce the direct computation
    * hash-for-hash — the ANN arm probes ALL cells, making IVF ranking
    * exhaustive-exact, and the BM25 arm's formula is ingest-invariant.
    */
  private lazy val HybridRrfOracle: String =
    s"""WITH base AS (
       |  SELECT doc_id, len(toks) AS dl,
       |         list_filter(list_transform(toks, t -> lower(t)),
       |                     t -> t IN (${hybInList(HybridTerms)})) AS hits
       |  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
       |        FROM documents)),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(hits) AS term
       |        FROM base WHERE len(hits) > 0)
       |  GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT tf.doc_id, $HybridBm25Contrib AS cm
       |  FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN stats),
       |top20 AS (
       |  SELECT doc_id, SUM(cm) AS score FROM sc GROUP BY 1
       |  ORDER BY score DESC, doc_id LIMIT 20),
       |sp AS (
       |  SELECT doc_id AS id,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |              AS INTEGER) AS srank
       |  FROM top20),
       |dtop AS (
       |  SELECT n.vec_id AS id,
       |         list_cosine_similarity(q.embedding, n.embedding) AS cos
       |  FROM embeddings n, embeddings q
       |  WHERE q.vec_id = 0 AND n.vec_id <> 0
       |  ORDER BY cos DESC, n.vec_id LIMIT 20),
       |dn AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id)
       |                  AS INTEGER) AS drank
       |  FROM dtop)
       |SELECT COALESCE(sp.id, dn.id) AS doc_id,
       |       COALESCE(CAST(ROUND(1000000.0 / (60 + srank)) AS BIGINT), 0)
       |     + COALESCE(CAST(ROUND(1000000.0 / (60 + drank)) AS BIGINT), 0)
       |         AS rrf_micro,
       |       sp.id IS NOT NULL AS in_sparse,
       |       dn.id IS NOT NULL AS in_dense
       |FROM sp FULL OUTER JOIN dn ON sp.id = dn.id
       |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin

  /** DuckDB twin of `sim_mmr_rerank`: the greedy MMR selection unrolled
    * as 10 chained CTE steps (p_i picks the argmax of rel − max-sim-to-
    * selected over the not-yet-picked; s_i accumulates the picks).
    * Everything is micro-rounded BEFORE comparisons, so both engines
    * compare identical integers; embeddings are double-cast on both
    * sides (the seeded-ANN-oracle discipline) so the rounding inputs
    * bit-match.
    */
  private lazy val MmrOracle: String = {
    val candAndSims =
      """WITH cand AS MATERIALIZED (
        |  SELECT id, rel, emb FROM (
        |    SELECT n.vec_id AS id,
        |           CAST(ROUND(1000000 * list_cosine_similarity(
        |             CAST(q.embedding AS DOUBLE[]),
        |             CAST(n.embedding AS DOUBLE[]))) AS BIGINT) AS rel,
        |           list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |             CAST(n.embedding AS DOUBLE[])) AS cos,
        |           n.embedding AS emb
        |    FROM embeddings n, embeddings q
        |    WHERE q.vec_id = 0 AND n.vec_id <> 0)
        |  ORDER BY cos DESC, id LIMIT 20),
        |sims AS MATERIALIZED (
        |  SELECT a.id AS ia, b.id AS ib,
        |         CAST(ROUND(1000000 * list_cosine_similarity(
        |           CAST(a.emb AS DOUBLE[]), CAST(b.emb AS DOUBLE[])))
        |           AS BIGINT) AS sm
        |  FROM cand a JOIN cand b ON a.id <> b.id),
        |p1 AS MATERIALIZED (SELECT id, rel AS score FROM cand ORDER BY score DESC, id LIMIT 1),
        |s1 AS MATERIALIZED (SELECT id FROM p1)""".stripMargin
    val steps = (2 to 10).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT c.id, c.rel - (SELECT MAX(sm) FROM sims
         |    WHERE ia = c.id AND ib IN (SELECT id FROM s${i - 1})) AS score
         |  FROM cand c WHERE c.id NOT IN (SELECT id FROM s${i - 1})
         |  ORDER BY score DESC, id LIMIT 1),
         |s$i AS MATERIALIZED (SELECT id FROM s${i - 1} UNION ALL SELECT id FROM p$i)""".stripMargin
    }
    val unions = (1 to 10)
      .map(i => s"SELECT id, $i AS i, score FROM p$i").mkString(" UNION ALL ")
    s"""$candAndSims,
       |${steps.mkString(",\n")}
       |SELECT id AS doc_id, CAST(i AS INTEGER) AS mmr_rank,
       |       score AS mmr_score_micro
       |FROM ($unions) ORDER BY mmr_rank""".stripMargin
  }

  /** kNN-classifier prediction CTEs (query < 25, k = 5, majority vote
    * with the n DESC / best_rank / label tie chain) ending in a `preds`
    * CTE — shared by the `embed_knn_classifier` oracle and the
    * `eval_classifier_metrics` confusion counts built on top of it.
    */
  private lazy val KnnPredsCtes: String =
    """topk AS (
      |  SELECT query_id, neighbor_id, rank FROM (
      |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |           CAST(row_number() OVER (PARTITION BY q.vec_id
      |             ORDER BY list_cosine_similarity(q.embedding, n.embedding)
      |               DESC, n.vec_id) AS INTEGER) AS rank
      |    FROM embeddings q, embeddings n
      |    WHERE q.vec_id < 25 AND n.vec_id <> q.vec_id)
      |  WHERE rank <= 5),
      |votes AS (
      |  SELECT t.query_id, e.label AS nlabel, COUNT(*) AS n,
      |         MIN(t.rank) AS best_rank
      |  FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
      |  GROUP BY 1, 2),
      |best AS (
      |  SELECT query_id, nlabel,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |           ORDER BY n DESC, best_rank ASC, nlabel ASC) AS rn
      |  FROM votes),
      |preds AS (
      |  SELECT e.vec_id AS query_id, e.label AS true_label,
      |         b.nlabel AS pred_label
      |  FROM embeddings e JOIN best b ON e.vec_id = b.query_id
      |  WHERE e.vec_id < 25 AND b.rn = 1)""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    // Embedding-cosine near-dup pairs, exact (oracle-checked correctness
    // baseline for the LSH path). Ids only — no float in the output.
    "dedup_embedding_pairs" -> ((s, dir) =>
      Similarity.allPairsAboveThreshold(Tables.embeddings(s, dir), 0.45)),

    // SEMANTIC benchmark decontamination (the embedding sibling of
    // text_decontaminate's 8-gram overlap): flag corpus vectors whose
    // cosine to ANY benchmark vector clears τ=0.9 — n-gram overlap misses
    // paraphrased contamination, embeddings catch it. The benchmark slice
    // (every 25th vec) stays IN the corpus, so each bench vector's corpus
    // twin is a guaranteed cos=1.0 hit exercising the flag path; natural
    // cross-vector cosines top out ≈0.6 (the sim_semdedup measurement), so
    // τ=0.9 is boundary-safe for the float compare in both engines.
    // Scale shape: the benchmark side is bounded by contract (an eval
    // suite, thousands of rows at worst) and broadcasts; the corpus
    // streams through one narrow pass — the same allowlisted
    // broadcast-bounded BNLJ class as sim_ann_xcheck. A benchmark too big
    // to broadcast moves to the IVF cell join (similarity/Ivf.scala).
    "sim_decontaminate_semantic" -> ((s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val bench = emb.filter($"vec_id" % 25 === 0)
        .select($"vec_id".as("bench_id"), $"embedding".cast("array<double>").as("bv"))
      val hits = emb
        .select($"vec_id", $"embedding".cast("array<double>").as("cv"))
        .crossJoin(broadcast(bench))
        .filter(expr("graft_cosine(cv, bv) >= 0.9"))
        .groupBy($"vec_id").agg(count(lit(1)).as("n_bench_hits"))
      emb.select($"vec_id").join(hits, Seq("vec_id"), "left")
        .selectExpr("vec_id",
          "CAST(COALESCE(n_bench_hits, 0) AS BIGINT) AS n_bench_hits",
          "n_bench_hits IS NOT NULL AS is_contaminated")
    }),

    // LSH-bucketed approximate top-k (the scale path; rows-only).
    "sim_ann_lsh" -> ((s, dir) =>
      Ann.topK(Tables.embeddings(s, dir), col("vec_id") < 8, k = 5)),

    // Seeded-deterministic LSH twin (named sim_ann_srp_seeded through
    // round 16): hyperplane signs come from the SAME integer recipe as
    // the oracled `embed_srp_project` projection (bit-exact
    // cross-engine), so signature bits, band keys, the candidate
    // equi-join, and the exact-cosine ranking ALL reproduce in DuckDB —
    // the whole LSH pipeline hash-matches end-to-end, completing the
    // full-oracle set across all three ANN modalities (IVF, PQ, LSH).
    // `sim_ann_lsh` keeps the Random(42)-planes variant with its
    // planted-copy xcheck.
    "sim_ann_lsh_seeded" -> ((s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      def comp(j: Int) =
        s"AGGREGATE(TRANSFORM(embedding, (v, i) -> " +
          s"CASE WHEN ((i * 73 + $j * 151 + i * $j * 11) % 97) % 2 = 0 " +
          "THEN CAST(v AS DOUBLE) ELSE -CAST(v AS DOUBLE) END), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x)"
      // 4 bands × 4 planes: band b's key packs the sign bits of planes
      // 4b .. 4b+3
      val bandKeys = (0 until 4).map { b =>
        val bits = (0 until 4).map(i =>
          s"(CASE WHEN ${comp(4 * b + i)} >= 0 THEN ${1 << i} ELSE 0 END)")
        s"NAMED_STRUCT('band_idx', $b, 'band_val', ${bits.mkString(" + ")})"
      }
      val banded = Tables.embeddings(s, dir)
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS vv",
          s"EXPLODE(ARRAY(${bandKeys.mkString(", ")})) AS band")
        .select($"vec_id", $"vv",
          $"band.band_idx".as("band_idx"), $"band.band_val".as("band_val"))
      val q = banded.filter($"vec_id" < 8).select($"vec_id".as("query_id"),
        $"vv".as("qv"), $"band_idx", $"band_val")
      val n = banded.select($"vec_id".as("neighbor_id"), $"vv".as("nv"),
        $"band_idx", $"band_val")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
      n.join(q, Seq("band_idx", "band_val"))
        .filter($"neighbor_id" =!= $"query_id")
        .dropDuplicates("query_id", "neighbor_id")
        .withColumn("cos", call_function("graft_cosine", $"qv", $"nv"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"neighbor_id", $"rank")
    }),

    // IVF-bucketed approximate top-k (second scale path; rows-only).
    "sim_ann_ivf" -> ((s, dir) =>
      graft.similarity.Ivf.topK(Tables.embeddings(s, dir), col("vec_id") < 8, k = 5)),

    // Seeded (iterations = 0) IVF: centroids ARE the vec_id < 4 vectors,
    // so every stage — assignment argmax, probe ranking, candidate cosine
    // ranking — reproduces formula-for-formula in the DuckDB oracle (the
    // J7 same-formula-both-sides discipline). This hash-matches the WHOLE
    // IVF pipeline end-to-end; `sim_ann_ivf` keeps Lloyd refinement for
    // recall and stays rows-only with the planted-copy xcheck.
    "sim_ann_ivf_seeded" -> ((s, dir) =>
      graft.similarity.Ivf.topK(Tables.embeddings(s, dir), col("vec_id") < 8,
        k = 5, nCentroids = 4, nProbe = 2, iterations = 0)),

    // Seeded PQ/ADC twin, same discipline: iterations = 0 keeps the
    // codebooks at their deterministic seeds (subvectors of the 16
    // lowest-id vectors), so code assignment, the micro-rounded LUT, and
    // the integer ADC ranking all reproduce in DuckDB (double-cast lists
    // make list_inner_product bit-match graft_dot's left-to-right double
    // accumulation). Hash-matches the WHOLE PQ pipeline; `sim_pq_topk`
    // keeps Lloyd refinement and the planted-copy xcheck.
    "sim_pq_topk_seeded" -> ((s, dir) =>
      graft.similarity.Pq.topK(Tables.embeddings(s, dir), col("vec_id") < 8,
        k = 5, m = 8, kCent = 16, iterations = 0)),

    // Seeded IVFADC twin (round 12): iterations = 0 on BOTH quantizers —
    // cells are the vec_id < 4 vectors, codebooks the residual
    // subvectors of the 16 lowest ids — so the ENTIRE composite
    // reproduces formula-for-formula in DuckDB: cosine cell assignment,
    // per-cell residuals (exact double subtraction both sides), residual
    // code argmin, the probe rule, per-(query, cell) residual LUTs, and
    // the micro-rounded integer ADC ranking. This closes the last
    // decision-only ANN gap: sim_ivfpq_topk's trained path stays
    // rows-only with the planted-copy xcheck, while the pipeline itself
    // is now FULL-hash-oracled end to end, like its IVF and PQ halves.
    "sim_ivfpq_seeded" -> ((s, dir) =>
      graft.similarity.IvfPq.topK(Tables.embeddings(s, dir),
        col("vec_id") < 8, k = 5, nCells = 4, nProbe = 2, m = 8, kCent = 16,
        ivfIterations = 0, pqIterations = 0)),

    // DECISION-level cross-check for BOTH ANN scale paths (the
    // dedup_decision_xcheck recipe lifted to vectors): plant an exact
    // duplicate of each query vector under a fresh id and demand each
    // path return it as the top-1 neighbor. Deterministic without
    // recomputing any hash in SQL: an identical vector shares every LSH
    // band (same hyperplane signs) and the same IVF cell (same argmax
    // centroid), so it is always a candidate, and its cosine ~1 beats
    // every non-parallel vector. A bucketing, probe, candidate-join, or
    // ranking bug in either path breaks the hash-match.
    "sim_ann_xcheck" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      val planted = emb.select($"vec_id", $"embedding").unionByName(dups)
      val lsh1 = Ann.topK(planted, $"vec_id" < 8, k = 1)
        .select($"query_id", $"neighbor_id".as("lsh_top1"))
      // iterations = 1: the planted-copy invariant holds under ANY
      // deterministic centroid set (identical vector ⇒ identical argmax
      // cell), so extra Lloyd refinement buys the cross-check nothing —
      // recall quality is sim_ann_ivf's and AnnSpec's concern
      val ivf1 = graft.similarity.Ivf.topK(planted, $"vec_id" < 8, k = 1,
          iterations = 1)
        .select($"query_id", $"neighbor_id".as("ivf_top1"))
      lsh1.join(ivf1, Seq("query_id"))
        .selectExpr("query_id", "lsh_top1", "ivf_top1",
          "lsh_top1 = query_id + 100000 AS lsh_self",
          "ivf_top1 = query_id + 100000 AS ivf_self")
    }),

    // Standing ANN index decision-xcheck: train frozen centroids on the
    // low-id corpus, ingest the rest in two append-only batches (the
    // second carrying planted exact copies of the query vectors), then
    // query the PERSISTED index — the StandingDedupIndex recipe lifted to
    // vectors. An identical vector lands in the same argmax cell under
    // the frozen centroids, the probe ranks that cell first, and cosine
    // ~1 beats every non-parallel vector, so top-1 must be the planted
    // id. An assignment, ingest, tag-skip, probe, or ranking bug breaks
    // the hash-match.
    "sim_standing_index" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "sim_standing_idx")
      Q.deleteDir(s, p)
      val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      val idx = new graft.similarity.StandingAnnIndex(s, p)
      idx.train(emb.filter($"vec_id" < 200), nCentroids = 8, iterations = 1)
      idx.ingest(emb.filter($"vec_id" >= 200 && $"vec_id" < 400), tag = 1L)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      idx.ingest(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L)
      idx.ingest(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L) // replay: must skip
      idx.query(emb.filter($"vec_id" < 8), k = 1, nProbe = 2)
        .selectExpr("query_id", "neighbor_id AS top1",
          "neighbor_id = query_id + 100000 AS found_planted")
    }),

    // PQ mode of the standing index: same planted-copy decision xcheck
    // through trainPq + two ingestPq batches + a replayed tag, but the
    // persisted corpus is m integer codes per vector and scoring is ADC —
    // an exact copy encodes to the query's own argmin codes under the
    // frozen codebooks, so its ADC distance is the attainable minimum.
    "sim_standing_pq" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "sim_standing_pq")
      Q.deleteDir(s, p)
      val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      val idx = new graft.similarity.StandingAnnIndex(s, p)
      idx.trainPq(emb.filter($"vec_id" < 200), m = 8, kCent = 16)
      idx.ingestPq(emb.filter($"vec_id" >= 200 && $"vec_id" < 400), tag = 1L)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      idx.ingestPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L)
      idx.ingestPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L) // replay
      idx.queryPq(emb.filter($"vec_id" < 8), k = 1)
        .selectExpr("query_id", "neighbor_id AS pq_top1",
          "neighbor_id = query_id + 100000 AS pq_self")
    }),

    // The PERSISTED IVFADC composition (sim_ivfpq_topk's standing-table
    // form, with both training artifacts frozen): cell_id-partitioned
    // integer code rows, per-probed-cell residual LUTs, tag-idempotent
    // replays. Decision oracle = the sim_ivfpq_xcheck planted invariant:
    // an exact copy shares its query's argmax cell, residual, and argmin
    // codes, and the query's own cell is its top probe ⇒ the copy attains
    // the minimum ADC distance and must rank top-1.
    "sim_standing_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "sim_standing_ivfpq")
      Q.deleteDir(s, p)
      val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      val idx = new graft.similarity.StandingAnnIndex(s, p)
      // ivfIterations = 1, pqIterations = 0 (cf. sim_ann_xcheck): the
      // planted decision holds under ANY deterministic centroid/codebook
      // sets — an identical vector co-cells, co-residuals, and co-codes
      // with its query regardless of refinement; recall quality is the
      // specs' concern
      idx.trainIvfPq(emb.filter($"vec_id" < 200), nCells = 16, m = 8,
        kCent = 16, ivfIterations = 1, pqIterations = 0)
      idx.ingestIvfPq(emb.filter($"vec_id" >= 200 && $"vec_id" < 400), tag = 1L)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      idx.ingestIvfPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L)
      idx.ingestIvfPq(emb.filter($"vec_id" >= 400).unionByName(dups), tag = 2L) // replay
      idx.queryIvfPq(emb.filter($"vec_id" < 8), k = 1)
        .selectExpr("query_id", "neighbor_id AS ivfpq_top1",
          "neighbor_id = query_id + 100000 AS ivfpq_self")
    }),

    // SemDeDup (Abbas et al. 2023): k-means-bucketed semantic dedup over
    // the FULL corpus, decision-oracled on planted ground truths (the
    // dedup_decision_xcheck recipe): an exact copy of each query vector
    // under a fresh higher id lands in the same k-means cell as its
    // original under ANY deterministic assignment (identical vector ⇒
    // identical argmax centroid), scores cosine 1 ≥ τ against it, and τ
    // = 0.9 clears every natural pair (measured max natural cosine ≈ 0.6
    // at sf0.1) — so the copy MUST be dropped with dup_of = the original,
    // and the original MUST survive. Truth-driven output (left side = the
    // planted set) keeps probabilistic sub-identical recall out of the
    // hash.
    "sim_semdedup" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      val planted = emb.select($"vec_id", $"embedding").unionByName(dups)
      // iterations = 1 (cf. sim_ann_xcheck): the planted decisions are
      // cell-quality-independent — identical vectors co-cell under any
      // deterministic centroids, only the copy reaches cosine >= tau, and
      // keep-lowest-id shields the original from its higher-id copy
      val dec = SemDeDup.decisions(planted, nCentroids = 16, iterations = 1,
        tau = 0.9)
      // Pivot original + copy onto one row via vec_id % 100000, so `dec`
      // appears ONCE in the plan — a self-join here would re-expand the
      // whole SemDeDup subtree (cell assignments + pair join) per side.
      dec.filter($"vec_id" < 8 || ($"vec_id" >= 100000 && $"vec_id" < 100008))
        .groupBy(($"vec_id" % 100000).as("__base"))
        .agg(
          max(when($"vec_id" < 100000, $"keep")).as("orig_kept"),
          max(when($"vec_id" >= 100000, $"keep")).as("dup_kept"),
          max(when($"vec_id" >= 100000, $"dup_of")).as("dup_of"))
        .select($"__base".as("vec_id"), $"orig_kept", $"dup_kept", $"dup_of")
    }),

    // PQ-ADC approximate top-k (third ANN scale path, the memory-side
    // one: m codes/vector instead of raw floats; rows-only like its
    // LSH/IVF siblings — ranks depend on the trained codebooks).
    "sim_pq_topk" -> ((s, dir) =>
      graft.similarity.Pq.topK(Tables.embeddings(s, dir), col("vec_id") < 8, k = 5)),

    // DECISION-level cross-check for the PQ path (the sim_ann_xcheck
    // recipe): plant an exact duplicate of each query vector under a
    // fresh id. An identical vector reaches the SAME argmin code in
    // every subspace (deterministic codebooks + deterministic argmin),
    // so its ADC distance is the attainable minimum — Σ_s min_c
    // d(q_s, c) — which no other corpus vector can undercut, and only a
    // full code-collision can tie. The copy MUST therefore rank top-1
    // once self is excluded. A codebook, encoding, LUT, or ranking bug
    // breaks the hash-match.
    "sim_pq_xcheck" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      val planted = emb.select($"vec_id", $"embedding").unionByName(dups)
      graft.similarity.Pq.topK(planted, $"vec_id" < 8, k = 1)
        .select($"query_id", $"neighbor_id".as("pq_top1"),
          ($"neighbor_id" === $"query_id" + 100000).as("pq_self"))
    }),

    // IVF-PQ composite (IVFADC): coarse cells narrow the search, PQ codes
    // over CELL RESIDUALS score it — the fourth ANN path and the one
    // production systems run at billion-vector scale (cells bound the
    // candidates, codes bound the memory). Rows-only like its siblings.
    // ivfIterations = 1 (round-12, per the round-11 verdict): in-bench
    // training work is bounded the way the xcheck twin's is —
    // ProfileAnnXcheck attributes ~2/3 of this query's wall to
    // refineCentroids + trainCodebooks, and recall quality lives in
    // IvfSpec/StandingIndexRetrainSpec, not this bench row; the
    // production path amortizes training (sim_standing_ivfpq).
    "sim_ivfpq_topk" -> ((s, dir) =>
      graft.similarity.IvfPq.topK(Tables.embeddings(s, dir),
        col("vec_id") < 8, k = 5, ivfIterations = 1)),

    // Decision cross-check (the sim_pq_xcheck recipe lifted to the
    // composite): an exact copy of each query assigns to the query's own
    // cell, leaves the identical residual, encodes to the same codes, and
    // the query always probes its own cell first — so the copy attains
    // the minimum ADC distance among probed candidates and must rank
    // top-1. Breaks if cell assignment, residual math, codebooks, the
    // probe rule, or the ADC join drift.
    "sim_ivfpq_xcheck" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val dups = emb.filter($"vec_id" < 8)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      val planted = emb.select($"vec_id", $"embedding").unionByName(dups)
      // ivfIterations = 1 for the same reason sim_ann_xcheck trains one
      // round: the planted-copy invariant holds under ANY deterministic
      // centroid set, so extra Lloyd refinement buys the cross-check
      // nothing — recall quality is sim_ivfpq_topk's concern
      graft.similarity.IvfPq.topK(planted, $"vec_id" < 8, k = 1,
          ivfIterations = 1)
        .select($"query_id", $"neighbor_id".as("ivfpq_top1"),
          ($"neighbor_id" === $"query_id" + 100000).as("ivfpq_self"))
    }),

    // Nearest-class-mean classifier over the labeled embeddings — the
    // simplest trained quality/domain classifier a curation pipeline
    // runs at scale (fastText-centroid style): TRAIN is one aggregation
    // pass (per-label 1e-6-grid quantized mean, the Ivf recipe — integer
    // sums, bit-deterministic under any partial-agg order), INFER is an
    // equi-join against the broadcast |labels|·dims centroid table with
    // an integer micro-rounded squared-L2 argmin. Fully oracled: both
    // engines quantize identically, so train AND infer decisions
    // hash-match. Scale: corpus appears as (vec_id, pos, x) narrow rows;
    // centroids are metadata-sized; one hash-agg shuffle per phase.
    "embed_centroid_classifier" -> ((s, dir) => {
      import s.implicits._
      val ex = Tables.embeddings(s, dir)
        .select($"vec_id", $"label",
          posexplode(expr("TRANSFORM(embedding, v -> CAST(v AS DOUBLE))"))
            .as(Seq("pos", "x")))
      val cent = ex.groupBy($"label".as("clabel"), $"pos")
        .agg((sum(round($"x" * 1e6)) / count(lit(1)) / 1e6).as("cx"))
      val dist = ex.join(broadcast(cent), Seq("pos"))
        .groupBy($"vec_id", $"clabel")
        .agg(sum(round(($"x" - $"cx") * ($"x" - $"cx") * 1e6)).cast("long")
          .as("d_micro"))
      val best = dist.groupBy($"vec_id")
        .agg(expr("min_by(clabel, named_struct('d', d_micro, 'l', clabel))")
          .as("pred_label"))
      Tables.embeddings(s, dir).select($"vec_id", $"label".as("true_label"))
        .join(best, Seq("vec_id"))
    }),

    // kNN label-vote classifier: top-5 cosine neighbors (the oracled
    // brute-force kernel, bounded query set — the ANN paths Ivf/IvfPq
    // share the output shape, so at scale the same vote composes over a
    // bucketed top-k instead) → majority label, ties by count DESC, best
    // rank ASC, label ASC. Fully oracled end-to-end: neighbor ranks AND
    // vote decisions hash-match.
    "embed_knn_classifier" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val topk = graft.similarity.Similarity
        .bruteForceTopK(emb, col("vec_id") < 25, k = 5)
      val votes = topk
        .join(emb.select($"vec_id".as("neighbor_id"), $"label".as("nlabel")),
          Seq("neighbor_id"))
        .groupBy($"query_id", $"nlabel")
        .agg(count(lit(1)).as("n"), min($"rank").as("best_rank"))
      val best = votes.groupBy($"query_id")
        .agg(expr("max_by(nlabel, named_struct('n', n, 'nr', -best_rank, " +
          "'nl', -nlabel))").as("pred_label"))
      emb.filter($"vec_id" < 25)
        .select($"vec_id".as("query_id"), $"label".as("true_label"))
        .join(best, Seq("query_id"))
    }),

    // Classifier evaluation metrics — per-label confusion counts
    // (support / tp / fp / fn, pure integers) over the kNN classifier's
    // oracled decisions: the model-eval harness next to the retrieval
    // one (eval_retrieval_metrics). Derived metrics (precision/recall/
    // F1) are ratios of these integers — left to the consumer so the
    // output stays division-free and engine-exact.
    "eval_classifier_metrics" -> ((s, dir) => {
      import s.implicits._
      val preds = defs("embed_knn_classifier")(s, dir)
      val t = preds.groupBy($"true_label".as("label")).agg(
        count(lit(1)).as("support"),
        sum(when($"pred_label" === $"true_label", 1L).otherwise(0L)).as("tp"))
      val p = preds.groupBy($"pred_label".as("label")).agg(
        sum(when($"pred_label" =!= $"true_label", 1L).otherwise(0L)).as("fp"))
      t.join(p, Seq("label"), "full_outer")
        .select($"label",
          coalesce($"support", lit(0L)).as("support"),
          coalesce($"tp", lit(0L)).as("tp"),
          coalesce($"fp", lit(0L)).as("fp"),
          (coalesce($"support", lit(0L)) - coalesce($"tp", lit(0L))).as("fn"))
    }),

    // Embedding column statistics via the codegen'd graft_dot kernel
    // (float elements widened to double per-element, accumulated in index
    // order — bit-identical to the oracle's double-cast list_sum). The
    // narrow-map shape a 100 TB embedding sweep needs; no shuffle at all.
    "embed_stats" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Tables.embeddings(s, dir).selectExpr(
        "vec_id",
        "SIZE(embedding) AS dim",
        "graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm",
        "AGGREGATE(TRANSFORM(embedding, v -> CAST(v AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x) AS sum_v",
        "ARRAY_MAX(TRANSFORM(embedding, v -> CAST(v AS DOUBLE))) AS max_v")
    }),

    // L2 normalization — the unit-vector prep for cosine indexes, one row
    // per (vector, index). Bit-exact across engines WITHOUT rounding:
    // IEEE sqrt and divide are correctly rounded, and the squared-norm
    // accumulates in index order through the codegen'd graft_dot kernel
    // (the exact pairing already proven by embed_stats' sq_norm).
    "embed_normalize" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Tables.embeddings(s, dir)
        .selectExpr("vec_id", "embedding",
          "SQRT(graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>))) AS nrm")
        .where("nrm > 0")
        .selectExpr("vec_id",
          "POSEXPLODE(TRANSFORM(embedding, v -> CAST(v AS DOUBLE) / nrm)) AS (idx, nv)")
    }),

    // Symmetric int8 quantization (scale = 127/max|v|, round-half-up via
    // floor so both engines agree) — the storage/bandwidth prep step for
    // embedding indexes. One row per (vector, index); exact integers.
    "embed_quantize_int8" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .selectExpr("vec_id", "embedding",
          "ARRAY_MAX(TRANSFORM(embedding, v -> ABS(CAST(v AS DOUBLE)))) AS m")
        .where("m > 0")
        .selectExpr("vec_id",
          "POSEXPLODE(TRANSFORM(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / m + 0.5) AS INT))) AS (idx, q)")
    }),

    // Signed random projection (Achlioptas-style ±1 sketch): 64-dim float
    // embeddings down to 16 dense dims, out_j = 0.125 * Σ_i s(i,j)·v_i
    // with deterministic ±1 signs derived from (i, j) — the cheap
    // dimensionality-reduction front of an ANN index (project first, then
    // bucket/score in 16-d instead of 64-d). Bit-exact across engines:
    // signs are integer-derived, accumulation is index-ordered double
    // adds (the embed_normalize discipline), and the 1/√64 scale is a
    // power of two. One narrow map per row — no shuffle at any scale.
    "embed_srp_project" -> ((s, dir) => {
      def sign(j: Int) =
        s"CASE WHEN ((i * 73 + $j * 151 + i * $j * 11) % 97) % 2 = 0 " +
          "THEN CAST(v AS DOUBLE) ELSE -CAST(v AS DOUBLE) END"
      val comps = (0 until 16).map(j =>
        s"AGGREGATE(TRANSFORM(embedding, (v, i) -> ${sign(j)}), " +
          "CAST(0 AS DOUBLE), (a, x) -> a + x) * 0.125").mkString(", ")
      Tables.embeddings(s, dir)
        .selectExpr("vec_id", s"POSEXPLODE(ARRAY($comps)) AS (j, p)")
    }),

    // N-gram Jaccard similarity over a bounded pair set (oracle-checked;
    // the unbounded path goes through MinHash LSH candidates instead).
    "ngram_jaccard_pairs" -> ((s, dir) => jaccardPairs(s, dir, bound = 25)),

    // Near-dup clusters via distributed connected components over the
    // exact-Jaccard edge graph (bounded population, same construction as
    // ngram_jaccard_pairs): pairs are not enough for a dedup DECISION —
    // transitivity must merge A~B~C into one cluster even when the A–C
    // pair was never emitted. Oracle = DuckDB recursive CTE reachability.
    "dedup_cc_groups" -> ((s, dir) => {
      import s.implicits._
      val edges = jaccardPairs(s, dir, bound = 25)
        .filter($"jaccard" >= 0.4).select($"id_a", $"id_b")
      graft.dedup.ConnectedComponents
        .components(edges, "id_a", "id_b",
          vertices = Some(shingleDocs(s, dir, bound = 25).select($"doc_id")))
        .select($"id".as("doc_id"), $"comp".as("component"))
    }),

    // The dedup DECISION end-to-end: near-dup clusters (same construction
    // as dedup_cc_groups) reduced to one KEEPER per cluster by QUALITY
    // (most tokens wins, ties to the smallest id) — real pipelines keep
    // the best duplicate, not the first. One join + one hash aggregate
    // over the labels; max_by on a (quality, -id) struct avoids a
    // per-cluster sort.
    "dedup_keep_best" -> ((s, dir) => {
      import s.implicits._
      val edges = jaccardPairs(s, dir, bound = 25)
        .filter($"jaccard" >= 0.4).select($"id_a", $"id_b")
      val labels = graft.dedup.ConnectedComponents
        .components(edges, "id_a", "id_b",
          vertices = Some(shingleDocs(s, dir, bound = 25).select($"doc_id")))
      val quality = Tables.documents(s, dir).filter($"doc_id" < 25)
        .selectExpr("doc_id", s"SIZE(${Q.TokensExpr}) AS n_tokens")
      labels.select($"id".as("doc_id"), $"comp".as("component"))
        .join(quality, Seq("doc_id"))
        .groupBy($"component")
        .agg(expr("max_by(doc_id, named_struct('q', n_tokens, 'neg_id', -doc_id))")
            .as("keep_id"),
          count(lit(1)).as("n_members"),
          max($"n_tokens").as("best_n_tokens"))
    }),

    // GROUP-AWARE train/eval split: the whole near-dup CLUSTER goes to one
    // side, decided by a hash of the cluster label — the constructive fix
    // for the leakage `sample_split_leakage` audits (a doc-level hash can
    // strand two near-identical docs on opposite sides; a cluster-level
    // hash cannot). Same CC labels as dedup_cc_groups, then a narrow map;
    // leakage across the split is zero BY CONSTRUCTION, which the oracle
    // re-derives independently from the recursive-CTE reachability.
    "sample_split_group" -> ((s, dir) => {
      import s.implicits._
      val edges = jaccardPairs(s, dir, bound = 25)
        .filter($"jaccard" >= 0.4).select($"id_a", $"id_b")
      graft.dedup.ConnectedComponents
        .components(edges, "id_a", "id_b",
          vertices = Some(shingleDocs(s, dir, bound = 25).select($"doc_id")))
        .select($"id".as("doc_id"), $"comp".as("component"))
        .withColumn("is_eval",
          expr("SUBSTRING(MD5(CONCAT('gsplit:', CAST(component AS STRING))), 1, 1)" +
            " IN ('0', '1', '2', '3')"))
    }),

    // Corpus-trained char-bigram LM quality scores, oracle-checked: the
    // NLL is emitted as an integer micro-NLL (round(nll*1e6)) so the
    // engines' last-ulp ln()/summation-order differences (≈1e-12) vanish
    // under the 5e-7 rounding threshold while the oracle still recomputes
    // the ENTIRE pipeline — normalization, per-doc bigram counts, add-one
    // smoothing, vocab, and the per-doc mean NLL — from scratch in SQL.
    "text_lm_score" -> ((s, dir) =>
      graft.text.NgramLM.selfScore(Tables.documents(s, dir), "doc_id", "text")
        .selectExpr("doc_id",
          "CAST(ROUND(nll * 1000000) AS BIGINT) AS nll_micro", "n_bigrams")),

    // Winnowing rolling-hash fingerprints (rows-only; xxhash64 has no
    // DuckDB twin — semantics in WinnowingSpec).
    "text_winnowing_fp" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Winnowing
        .fingerprintIndex(Tables.documents(s, dir), "doc_id", "text")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_fp"), min($"fp").as("min_fp"), max($"fp").as("max_fp"))
    }),

    // xxhash64 MinHash band signatures (rows-only; pair-finding semantics
    // proven in MinHashSpec with planted near-dups; native-expression
    // parity with the declarative signature pinned in MinHashSpec).
    "dedup_minhash_sig" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir).filter(MinHash.shingleFilter(col("text")))
        .selectExpr("doc_id", "explode(graft_xx_minhash_bands(text, 16, 4, 3)) AS band")
        .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    }),

    // LSH near-dup end-to-end: banded candidates → exact Jaccard gate
    // (rows-only: xxhash64 buckets; semantics in MinHashSpec).
    "dedup_lsh_near_pairs" -> ((s, dir) =>
      MinHash.nearDuplicates(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.4)),

    // 64-bit SimHash fingerprints (rows-only; see SimHashSpec).
    "dedup_simhash" -> ((s, dir) =>
      SimHash.withSimhash(
        Tables.documents(s, dir).select("doc_id", "text"), "text")
        .select("doc_id", "sim")),

    // Multimodal frame extraction: REAL GMJB container frames per video
    // asset; the frame count derives from the text byte length alone, so
    // it is SQL-derivable.
    "mm_frame_count" -> ((s, dir) => {
      import s.implicits._
      val assets = MultimodalOps.assetsFromDocuments(Tables.documents(s, dir))
      MultimodalOps.sampleFrames(assets)
        .groupBy($"asset_id").agg(count(lit(1)).as("n_frames"))
    }),

    // Multimodal resize plumbing: metadata recompute is deterministic and
    // SQL-derivable (payload transform stubbed as identity).
    "mm_resize_meta" -> ((s, dir) => {
      import s.implicits._
      val assets = MultimodalOps.assetsFromDocuments(Tables.documents(s, dir))
      MultimodalOps.resize(assets, 64, 64).toDF()
        .selectExpr("asset_id", "kind", "width", "height",
          "CAST(OCTET_LENGTH(content) AS INTEGER) AS n_bytes")
    }),

    // Multimodal feature extraction, oracle-checked: the integer decode
    // components every float feature derives from (per-channel pixel sums
    // for image/video, PCM sample moments for audio, decoded dims + frame
    // counts) — all three REAL codecs exercised end-to-end, and every
    // value recomputable by the SQL oracle straight from the text bytes
    // (the mm_decode_* recipe, split per channel). ASCII-bounded in both
    // engines for the same 1-based-ascii() reason as mm_decode_image.
    // The float vector itself is a row-local constant-divisor function of
    // these integers (MultimodalSpec pins that correspondence).
    "mm_features" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .where("LENGTH(text) >= 1 AND LENGTH(text) = OCTET_LENGTH(text)")
      MultimodalOps.featureComponents(MultimodalOps.assetsFromDocuments(docs))
    }),

    // REAL image decode, oracle-checked: the BMP payload built from the
    // text bytes is decoded with ImageIO and reduced to decoded dims +
    // the exact integer sum of all channel values; the oracle recomputes
    // the same sum straight from the text bytes (the pixel stream cycles
    // them), so any header/stride/padding/channel bug breaks the match.
    // Bounded to non-empty pure-ASCII docs in BOTH engines: the oracle
    // recomputes pixel bytes via 1-based character indexing + ascii(),
    // which only equals the UTF-8 byte stream when chars == bytes.
    "mm_decode_image" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .where("LENGTH(text) >= 1 AND LENGTH(text) = OCTET_LENGTH(text)")
      MultimodalOps.decodeImageStats(MultimodalOps.assetsFromDocuments(docs))
    }),

    // REAL audio decode, oracle-checked: the PCM-16 WAV payload decoded
    // with AudioSystem and reduced to sample count + exact integer sum and
    // sum-of-squares of all samples; the oracle recomputes the same
    // integers from the text bytes (sample i = (byte_i - 128)·256).
    // ASCII-bounded like mm_decode_image for the same ascii() reason.
    "mm_decode_audio" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .where("LENGTH(text) >= 1 AND LENGTH(text) = OCTET_LENGTH(text)")
      MultimodalOps.decodeAudioStats(MultimodalOps.assetsFromDocuments(docs))
    }),

    // REAL video decode, oracle-checked (the mm_decode_image recipe on the
    // GMJB container): every frame decoded via ImageIO, reduced to frame
    // count + dims + the exact integer sum of all channel values across
    // all frames; the oracle recomputes the same sum from the text bytes
    // (frame f's pixel stream starts at byte f·31). ASCII-bounded like
    // mm_decode_image for the same 1-based-ascii() reason.
    "mm_decode_video" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .where("LENGTH(text) >= 1 AND LENGTH(text) = OCTET_LENGTH(text)")
      MultimodalOps.decodeVideoStats(MultimodalOps.assetsFromDocuments(docs))
    }),

    // Image near-dup dedup via perceptual hash — the missing MODALITY in
    // the dedup family (text: minhash/simhash/winnow; vectors: semdedup;
    // here: pixels). Every image decodes to a 64-bit dHash (adjacent-pixel
    // gray comparisons — invariant under uniform brightness shift), hashes
    // band into 4×16 bits, and candidates pair by band equi-join (never
    // image×image), Hamming ≤ 2. Decision-oracled on planted ground truth
    // (the sim_semdedup recipe): a pixel-identical copy of each small-id
    // image under id+99999 (≡ 0 mod 3, so the asset stays an image) shares
    // every band and pairs its original at Hamming 0 — a decode, hashing,
    // banding, or pairing bug breaks the hash-match. The band self-join
    // re-expands the bounded decode subtree once per side (the
    // sim_semdedup caveat) — acceptable: the planted population is fixed
    // and the full-corpus path is the same band index at any scale.
    "dedup_image_phash" -> ((s, dir) =>
      perceptualPairs(s, dir, kindMod = 0, MultimodalOps.decodeImagePHash)),

    // The AUDIO modality of the same dedup family: decoded PCM streams
    // fingerprint via adjacent-window energy comparisons
    // (decodeAudioFPrint — invariant under uniform volume change, the
    // acoustic analog of the brightness-shift class), then the identical
    // banded-Hamming pairing as dedup_image_phash. The planted copies are
    // GAIN-SHIFTED (every sample halved — a real re-encode, not a byte
    // copy): the oracle's Hamming-0 pairing proves the invariance class,
    // not just hash determinism (round-14 verdict #5).
    "dedup_audio_fprint" -> ((s, dir) =>
      perceptualPairs(s, dir, kindMod = 1, MultimodalOps.decodeAudioFPrint,
        MultimodalOps.wavHalfGain)),

    // And the VIDEO modality: per-frame dHash + order-free majority vote
    // per bit (decodeVideoFPrint — invariant under frame reorder and
    // per-frame brightness shift), same banding. The planted copies are
    // RE-CONTAINERED (same frames repacked in reverse — a container-level
    // edit, not a byte copy), so the oracle's Hamming-0 pairing proves
    // the reorder-invariance class end-to-end (round-14 verdict #6). All
    // three media kinds run the one perceptual-dedup pipeline.
    "dedup_video_fprint" -> ((s, dir) =>
      perceptualPairs(s, dir, kindMod = 2, MultimodalOps.decodeVideoFPrint,
        MultimodalOps.mjbRecontainReversed)),

    // Streaming transform exercised on the batch events table (the same
    // windowedCounts plan runs under readStream with a watermark — see
    // EventStreamsSpec for the streaming drive).
    "events_windowed_agg" -> ((s, dir) =>
      graft.streaming.EventStreams.windowedCounts(Tables.events(s, dir))),

    // Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    // event lands in 2 windows (completes the window family: tumbling in
    // events_windowed_agg, session below, hopping here).
    "events_hop_window" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"))
        .select($"window.start".as("window_start"), $"event_type", $"n_events")
    }),

    // Spark's native session_window aggregation (gap-merged sessions; the
    // declarative twin of the flatMapGroupsWithState sessionizer).
    "events_session_window" -> ((s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          $"session_window.start".as("session_start"),
          $"session_window.end".as("session_end"), $"n_events")
    }),

    // Stream-stream interval join, batch twin (same plan runs under two
    // watermarked streams — see EventStreamsSpec).
    "events_interval_join" -> ((s, dir) =>
      graft.streaming.EventStreams.clicksWithRecentViews(Tables.events(s, dir))),

    // JSON extraction over the events props column (semi-structured path).
    "events_json_extract" -> ((s, dir) => {
      Tables.events(s, dir).selectExpr("event_id",
        "CAST(get_json_object(props, '$.k') AS INTEGER) AS k")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    // a sparse BM25 arm over the documents table and a dense cosine arm
    // over the embeddings table (doc_id ≡ vec_id in the fixture corpus),
    // fused as Σ_arms round(1e6 / (60 + rank)) — the standard RAG /
    // retrieval-curation primitive that neither arm alone expresses.
    // Scale shapes: the sparse arm is the text_bm25_topk plan (tokenizer
    // runs once per doc, only query-term hits explode, df/totals reduce
    // to ≤|terms|+1 broadcast rows) with top-20 via orderBy+limit =
    // TakeOrderedAndProject — per-partition heaps, no global sort; the
    // dense arm broadcasts the ONE query vector (BNLJ allowlisted: the
    // broadcast side is a single row) and also TakeOrderedAndProject's
    // its top-20; rank assignment windows over the 20 survivors only.
    // The fusion join and final top-10 touch ≤ 40 rows. Every float is
    // micro-rounded before fusion, so the output is integer-exact.
    "sim_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("hyb_docs")
      val sparse = s.sql(s"""
        |WITH base AS (
        |  SELECT doc_id, SIZE(toks) AS dl,
        |         FILTER(TRANSFORM(toks, t -> LOWER(t)),
        |                t -> t IN (${hybInList(HybridTerms)})) AS hits
        |  FROM (SELECT doc_id, ${Q.TokensExpr} AS toks FROM hyb_docs)),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, EXPLODE(hits) AS term
        |        FROM base WHERE SIZE(hits) > 0)
        |  GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, $HybridBm25Contrib AS cm FROM (
        |    SELECT tf.doc_id, tf.tf, tf.dl, dfx.df,
        |           (SELECT n_docs FROM stats) AS n_docs,
        |           (SELECT sum_dl FROM stats) AS sum_dl
        |    FROM tf JOIN dfx ON tf.term = dfx.term)),
        |top20 AS (
        |  SELECT doc_id, SUM(cm) AS score FROM sc GROUP BY 1
        |  ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT doc_id AS id,
        |       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
        |            AS INT) AS srank
        |FROM top20""".stripMargin)
      val base = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val qv = base.filter($"vec_id" === 0).select($"v".as("qv"))
      val dtop = base.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos", call_function("graft_cosine", $"qv", $"v"))
        .orderBy($"cos".desc, $"vec_id").limit(20)
      // single-partition window is fine: input is the 20-row top-k
      val dense = dtop
        .withColumn("drank",
          row_number().over(Window.orderBy($"cos".desc, $"vec_id")).cast("int"))
        .select($"vec_id".as("id"), $"drank")
      graft.operators.Rrf.fuse(
          Seq(sparse.withColumnRenamed("srank", "rank"),
            dense.withColumnRenamed("drank", "rank")), "id", "rank", k = 10)
        .select($"id".as("doc_id"), $"rrf_micro",
          $"in_0".as("in_sparse"), $"in_1".as("in_dense"))
    }),

    // MMR diversification rerank (Carbonell & Goldstein 1998) over the
    // dense top-20 candidates for query vector 0: relevance and pairwise
    // similarity micro-rounded to integers (λ = 0.5, everything ×2 so
    // score = rel_micro − max sim_micro stays integral), greedy pick of
    // 10. The sequential greedy runs where rerankers always run — on the
    // BOUNDED top-N list after distributed candidate generation; the
    // pairwise sims come from the codegen'd graft_cosine. The oracle
    // unrolls the 10 greedy steps as chained CTEs over the same integers
    // — a full hash oracle for an iterative algorithm.
    "sim_mmr_rerank" -> ((s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val base = Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val qv = base.filter($"vec_id" === 0).select($"v".as("qv"))
      val cand = base.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos", call_function("graft_cosine", $"qv", $"v"))
        .orderBy($"cos".desc, $"vec_id").limit(20)
        .select($"vec_id".as("id"),
          round($"cos" * 1e6).cast("long").as("rel_micro"), $"v")
      graft.similarity.Mmr.rerank(cand, k = 10)
    }),

    // The persisted retrieval stack end-to-end: the SAME hybrid-RRF
    // semantics as sim_hybrid_rrf, but both arms answer from standing
    // index tables — the sparse arm from a StandingBm25Index built in two
    // ingests plus a replayed tag (exactly-once counts: a re-appended
    // batch would double tf/df and break the hash), the dense arm from a
    // StandingAnnIndex built train + two ingests, probed at nProbe =
    // nCells so IVF ranking is exhaustive-EXACT and the direct-formula
    // oracle still applies bit-for-bit. This is the query a production
    // corpus actually runs: nothing is recomputed from the raw corpus at
    // query time — postings, vectors, and totals all come from tables the
    // ingests maintained. Fusion arithmetic identical to sim_hybrid_rrf.
    "sim_hybrid_standing" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val p = Q.scratch(dir, "sim_hybrid_standing")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      val bm25 = new graft.text.StandingBm25Index(s, s"$p/bm25")
      bm25.ingest(docs.filter($"doc_id" < 250), tag = 1L)
      bm25.ingest(docs.filter($"doc_id" >= 250), tag = 2L)
      bm25.ingest(docs.filter($"doc_id" >= 250), tag = 2L) // replay: no-op
      // rank the ≤20 sparse survivors (bounded single-partition window)
      val sparse = bm25.query(HybridTerms, k = 20)
        .withColumn("srank", row_number()
          .over(Window.orderBy($"score_micro".desc, $"doc_id")).cast("int"))
        .select($"doc_id".as("id"), $"srank")
      val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      val ann = new graft.similarity.StandingAnnIndex(s, s"$p/ann")
      ann.train(emb.filter($"vec_id" < 200), nCentroids = 8, iterations = 1)
      ann.ingest(emb.filter($"vec_id" >= 200 && $"vec_id" < 400), tag = 1L)
      ann.ingest(emb.filter($"vec_id" >= 400), tag = 2L)
      ann.ingest(emb.filter($"vec_id" >= 400), tag = 2L) // replay: no-op
      val dense = ann.query(emb.filter($"vec_id" === 0), k = 20, nProbe = 8)
        .select($"neighbor_id".as("id"), $"rank".cast("int").as("drank"))
      graft.operators.Rrf.fuse(
          Seq(sparse.withColumnRenamed("srank", "rank"),
            dense.withColumnRenamed("drank", "rank")), "id", "rank", k = 10)
        .select($"id".as("doc_id"), $"rrf_micro",
          $"in_0".as("in_sparse"), $"in_1".as("in_dense"))
    }),

    // Full medallion pipeline end-to-end (§2.8): raw CSV/JSON landing →
    // bronze (inferred scans, append) → silver (clean + merge) → gold
    // (pre-agg + batch-key join + merge), then the gold table read back.
    // The oracle derives the same gold state straight from the base tables.
    "pipeline_gold_e2e" -> ((s, dir) => {
      val work = Q.scratch(dir, "pipeline")
      Q.deleteDir(s, work)
      graft.pipeline.Pipeline.run(s, dir, work)
      s.read.option("mergeSchema", true).parquet(s"$work/gold/wide_orders")
        .selectExpr("CAST(o_orderkey AS BIGINT) AS o_orderkey",
          "CAST(o_custkey AS BIGINT) AS o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority",
          "CAST(data_block_id AS INTEGER) AS data_block_id",
          "sum_qty", "revenue", "line_cnt")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_ann_ivf_seeded" ->
      ("""WITH cents AS (
         |  SELECT vec_id AS cell_id, embedding AS cv
         |  FROM embeddings WHERE vec_id < 4),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC,
         |                      c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cell_id FROM (
         |    SELECT q.vec_id AS query_id, c.cell_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY list_cosine_similarity(q.embedding, c.cv) DESC,
         |                      c.cell_id) AS rn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 8)
         |  WHERE rn <= 2)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY p.query_id
         |           ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
         |                    a.vec_id) AS INTEGER) AS rank
         |  FROM probes p
         |  JOIN assign a ON a.cell_id = p.cell_id AND a.vec_id <> p.query_id
         |  JOIN embeddings q ON q.vec_id = p.query_id
         |  JOIN embeddings n ON n.vec_id = a.vec_id)
         |WHERE rank <= 5""".stripMargin),
    "sim_ann_lsh_seeded" ->
      ("""WITH sigs AS (
         |  SELECT vec_id, j,
         |    list_sum(list_transform(range(0, len(embedding)), i ->
         |      CASE WHEN ((i * 73 + j * 151 + i * j * 11) % 97) % 2 = 0
         |           THEN CAST(embedding[i + 1] AS DOUBLE)
         |           ELSE -CAST(embedding[i + 1] AS DOUBLE) END)) AS p
         |  FROM embeddings, range(16) t(j)),
         |bits AS (
         |  SELECT vec_id, CAST(j // 4 AS INTEGER) AS band_idx,
         |         CASE WHEN p >= 0 THEN 1 << (j % 4) ELSE 0 END AS bit
         |  FROM sigs),
         |bands AS (
         |  SELECT vec_id, band_idx, CAST(SUM(bit) AS INTEGER) AS band_val
         |  FROM bits GROUP BY 1, 2),
         |qb AS (SELECT vec_id AS query_id, band_idx, band_val
         |       FROM bands WHERE vec_id < 8),
         |cand AS (
         |  SELECT DISTINCT q.query_id, n.vec_id AS neighbor_id
         |  FROM qb q JOIN bands n
         |    ON n.band_idx = q.band_idx AND n.band_val = q.band_val
         |  WHERE n.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY c.query_id
         |           ORDER BY list_cosine_similarity(qe.embedding, ne.embedding) DESC,
         |                    c.neighbor_id) AS INTEGER) AS rank
         |  FROM cand c
         |  JOIN embeddings qe ON qe.vec_id = c.query_id
         |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id)
         |WHERE rank <= 5""".stripMargin),
    "sim_pq_topk_seeded" ->
      ("""WITH subs AS (SELECT unnest(generate_series(0, 7)) AS sub_id),
         |seeds AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code
         |  FROM (SELECT DISTINCT vec_id FROM embeddings
         |        WHERE vec_id IS NOT NULL ORDER BY vec_id LIMIT 16)),
         |vsubs AS (
         |  SELECT e.vec_id, s.sub_id,
         |         (CAST(e.embedding AS DOUBLE[]))[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS sv
         |  FROM embeddings e CROSS JOIN subs s),
         |books AS (
         |  SELECT v.sub_id, sd.code, v.sv AS cv
         |  FROM seeds sd JOIN vsubs v ON v.vec_id = sd.vec_id),
         |codes AS (
         |  SELECT vec_id, sub_id, code FROM (
         |    SELECT v.vec_id, v.sub_id, b.code,
         |           row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY
         |             list_inner_product(v.sv, v.sv) + list_inner_product(b.cv, b.cv)
         |               - 2 * list_inner_product(v.sv, b.cv), b.code) AS rn
         |    FROM vsubs v JOIN books b ON b.sub_id = v.sub_id) WHERE rn = 1),
         |lut AS (
         |  SELECT qs.vec_id AS query_id, b.sub_id, b.code,
         |         CAST(round((list_inner_product(qs.sv, qs.sv)
         |             + list_inner_product(b.cv, b.cv)
         |             - 2 * list_inner_product(qs.sv, b.cv)) * 1e6) AS BIGINT) AS dist_micro
         |  FROM vsubs qs JOIN books b ON b.sub_id = qs.sub_id
         |  WHERE qs.vec_id < 8),
         |adc AS (
         |  SELECT l.query_id, c.vec_id AS neighbor_id,
         |         SUM(l.dist_micro) AS adist
         |  FROM codes c JOIN lut l ON l.sub_id = c.sub_id AND l.code = c.code
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY adist, neighbor_id) AS INTEGER) AS rank
         |  FROM adc WHERE neighbor_id <> query_id)
         |WHERE rank <= 5""".stripMargin),
    "sim_ivfpq_seeded" ->
      ("""WITH cents AS (
         |  SELECT vec_id AS cell_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id < 4),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY list_cosine_similarity(e.embedding, c.cv) DESC,
         |                      c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
         |resid AS (
         |  SELECT e.vec_id, a.cell_id,
         |         list_transform(range(1, len(e.embedding) + 1),
         |           i -> CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) AS rv
         |  FROM embeddings e
         |  JOIN assign a ON a.vec_id = e.vec_id
         |  JOIN cents c ON c.cell_id = a.cell_id),
         |subs AS (SELECT unnest(generate_series(0, 7)) AS sub_id),
         |vsubs AS (
         |  SELECT r.vec_id, r.cell_id, s.sub_id,
         |         r.rv[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS sv
         |  FROM resid r CROSS JOIN subs s),
         |seeds AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code
         |  FROM (SELECT DISTINCT vec_id FROM embeddings
         |        WHERE vec_id IS NOT NULL ORDER BY vec_id LIMIT 16)),
         |books AS (
         |  SELECT v.sub_id, sd.code, v.sv AS cv
         |  FROM seeds sd JOIN vsubs v ON v.vec_id = sd.vec_id),
         |codes AS (
         |  SELECT vec_id, cell_id, sub_id, code FROM (
         |    SELECT v.vec_id, v.cell_id, v.sub_id, b.code,
         |           row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY
         |             list_inner_product(v.sv, v.sv) + list_inner_product(b.cv, b.cv)
         |               - 2 * list_inner_product(v.sv, b.cv), b.code) AS rn
         |    FROM vsubs v JOIN books b ON b.sub_id = v.sub_id) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cell_id FROM (
         |    SELECT q.vec_id AS query_id, c.cell_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY list_cosine_similarity(q.embedding, c.cv) DESC,
         |                      c.cell_id) AS rn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 8)
         |  WHERE rn <= 2),
         |qresid AS (
         |  SELECT p.query_id, p.cell_id,
         |         list_transform(range(1, len(q.embedding) + 1),
         |           i -> CAST(q.embedding[i] AS DOUBLE) - c.cv[i]) AS qrv
         |  FROM probes p
         |  JOIN embeddings q ON q.vec_id = p.query_id
         |  JOIN cents c ON c.cell_id = p.cell_id),
         |qsubs AS (
         |  SELECT r.query_id, r.cell_id, s.sub_id,
         |         r.qrv[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS qv
         |  FROM qresid r CROSS JOIN subs s),
         |lut AS (
         |  SELECT qs.query_id, qs.cell_id, b.sub_id, b.code,
         |         CAST(round((list_inner_product(qs.qv, qs.qv)
         |             + list_inner_product(b.cv, b.cv)
         |             - 2 * list_inner_product(qs.qv, b.cv)) * 1e6) AS BIGINT) AS dist_micro
         |  FROM qsubs qs JOIN books b ON b.sub_id = qs.sub_id),
         |adc AS (
         |  SELECT l.query_id, c.vec_id AS neighbor_id, SUM(l.dist_micro) AS adist
         |  FROM codes c
         |  JOIN lut l ON l.cell_id = c.cell_id AND l.sub_id = c.sub_id
         |            AND l.code = c.code
         |  GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT query_id, neighbor_id,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY adist, neighbor_id) AS INTEGER) AS rank
         |  FROM adc WHERE neighbor_id <> query_id)
         |WHERE rank <= 5""".stripMargin),
    "dedup_embedding_pairs" ->
      ("SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
       "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
       "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45"),
    "sim_decontaminate_semantic" ->
      ("""WITH hits AS (
         |  SELECT c.vec_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits
         |  FROM embeddings c JOIN embeddings b
         |    ON b.vec_id % 25 = 0
         |   AND list_cosine_similarity(c.embedding, b.embedding) >= 0.9
         |  GROUP BY c.vec_id)
         |SELECT e.vec_id,
         |       COALESCE(h.n_bench_hits, 0) AS n_bench_hits,
         |       h.n_bench_hits IS NOT NULL AS is_contaminated
         |FROM embeddings e LEFT JOIN hits h ON e.vec_id = h.vec_id""".stripMargin),
    // n_bytes mirrors the real container sizes: a 64×64 24-bit BMP after
    // the real resize re-encode (54-byte headers + 64 rows of 192 bytes),
    // a PCM-16 WAV (44-byte header + 2 bytes/sample), and a GMJB video
    // container of nf re-encoded 64×64 frames (8-byte container header +
    // nf × (4-byte length prefix + 12342-byte BMP)), nf = bytes % 3 + 2.
    "mm_resize_meta" ->
      ("""SELECT doc_id AS asset_id,
         |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
         |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(CASE WHEN doc_id % 3 = 1 THEN OCTET_LENGTH(ENCODE(text)) % 640 + 16
         |            ELSE 64 END AS INTEGER) AS width,
         |  CAST(CASE WHEN doc_id % 3 = 1 THEN OCTET_LENGTH(ENCODE(text)) % 480 + 16
         |            ELSE 64 END AS INTEGER) AS height,
         |  CAST(CASE CAST(doc_id % 3 AS INTEGER)
         |       WHEN 0 THEN 54 + 64 * 192
         |       WHEN 1 THEN 44 + 2 * OCTET_LENGTH(ENCODE(text))
         |       ELSE 8 + (OCTET_LENGTH(ENCODE(text)) % 3 + 2) * (4 + 54 + 64 * 192)
         |       END AS INTEGER) AS n_bytes
         |FROM documents""".stripMargin),
    "dedup_image_phash" ->
      ("""SELECT doc_id AS orig_id, doc_id + 99999 AS copy_id,
         |       CAST(0 AS INTEGER) AS hamming, true AS is_pair
         |FROM documents
         |WHERE doc_id % 3 = 0 AND doc_id < 60
         |  AND length(text) >= 1 AND length(text) = octet_length(encode(text))
         |  AND octet_length(encode(text)) % 48 >= 1""".stripMargin),
    "dedup_audio_fprint" ->
      ("""SELECT doc_id AS orig_id, doc_id + 99999 AS copy_id,
         |       CAST(0 AS INTEGER) AS hamming, true AS is_pair
         |FROM documents
         |WHERE doc_id % 3 = 1 AND doc_id < 60
         |  AND length(text) >= 1 AND length(text) = octet_length(encode(text))
         |  AND octet_length(encode(text)) >= 65""".stripMargin),
    "dedup_video_fprint" ->
      ("""SELECT doc_id AS orig_id, doc_id + 99999 AS copy_id,
         |       CAST(0 AS INTEGER) AS hamming, true AS is_pair
         |FROM documents
         |WHERE doc_id % 3 = 2 AND doc_id < 60
         |  AND length(text) >= 1 AND length(text) = octet_length(encode(text))
         |  AND octet_length(encode(text)) % 24 >= 1""".stripMargin),
    "mm_decode_image" ->
      ("""WITH img AS (
         |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
         |         OCTET_LENGTH(ENCODE(text)) % 48 + 8 AS w,
         |         OCTET_LENGTH(ENCODE(text)) % 32 + 8 AS h
         |  FROM documents
         |  WHERE doc_id % 3 = 0 AND length(text) >= 1
         |    AND length(text) = octet_length(encode(text))),
         |px AS (
         |  SELECT doc_id, w, h, n, text, unnest(range(0, w * h * 3)) AS i
         |  FROM img)
         |SELECT doc_id AS asset_id, CAST(w AS INTEGER) AS dec_w,
         |       CAST(h AS INTEGER) AS dec_h,
         |       CAST(SUM(ascii(text[CAST(i % n AS INTEGER) + 1])) AS BIGINT) AS px_sum
         |FROM px GROUP BY 1, 2, 3""".stripMargin),
    "mm_frame_count" ->
      ("SELECT doc_id AS asset_id, " +
       "CAST(OCTET_LENGTH(ENCODE(text)) % 3 + 2 AS BIGINT) " +
       "AS n_frames FROM documents WHERE doc_id % 3 = 2"),
    "mm_features" ->
      ("""WITH ascii_docs AS (
         |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n
         |  FROM documents
         |  WHERE length(text) >= 1 AND length(text) = octet_length(encode(text))),
         |img AS (
         |  SELECT doc_id, text, n, n % 48 + 8 AS w, n % 32 + 8 AS h
         |  FROM ascii_docs WHERE doc_id % 3 = 0),
         |img_px AS (
         |  SELECT doc_id, w, h,
         |    SUM(CASE WHEN i % 3 = 0 THEN ascii(text[CAST(i % n AS INTEGER) + 1]) END) AS sr,
         |    SUM(CASE WHEN i % 3 = 1 THEN ascii(text[CAST(i % n AS INTEGER) + 1]) END) AS sg,
         |    SUM(CASE WHEN i % 3 = 2 THEN ascii(text[CAST(i % n AS INTEGER) + 1]) END) AS sb
         |  FROM img, unnest(range(0, w * h * 3)) AS t(i)
         |  GROUP BY 1, 2, 3),
         |img_out AS (
         |  SELECT doc_id AS asset_id, 'image' AS kind,
         |         54 + ((3 * w + 3) // 4) * 4 * h AS n_bytes,
         |         w AS c1, h AS c2, sr AS c3, sg AS c4, sb AS c5, 0 AS c6
         |  FROM img_px),
         |au_out AS (
         |  SELECT doc_id AS asset_id, 'audio' AS kind, 44 + 2 * n AS n_bytes,
         |         n AS c1,
         |         SUM((ascii(text[CAST(i AS INTEGER) + 1]) - 128) * 256) AS c2,
         |         SUM(((ascii(text[CAST(i AS INTEGER) + 1]) - 128) * 256) *
         |             ((ascii(text[CAST(i AS INTEGER) + 1]) - 128) * 256)) AS c3,
         |         0 AS c4, 0 AS c5, 0 AS c6
         |  FROM ascii_docs, unnest(range(0, n)) AS t(i)
         |  WHERE doc_id % 3 = 1
         |  GROUP BY 1, 2, 3, 4),
         |vid AS (
         |  SELECT doc_id, text, n, n % 24 + 8 AS w, n % 16 + 8 AS h,
         |         n % 3 + 2 AS nf
         |  FROM ascii_docs WHERE doc_id % 3 = 2),
         |vid_b AS (
         |  SELECT doc_id, w, h, nf, j2 % (w * h * 3) AS j,
         |         ascii(text[CAST((CAST(j2 // (w * h * 3) AS INTEGER) * 31
         |           + j2 % (w * h * 3)) % n AS INTEGER) + 1]) AS b
         |  FROM vid, unnest(range(0, nf * w * h * 3)) AS t(j2)),
         |vid_out AS (
         |  SELECT doc_id AS asset_id, 'video' AS kind,
         |         8 + nf * (4 + 54 + ((3 * w + 3) // 4) * 4 * h) AS n_bytes,
         |         nf AS c1, w AS c2, h AS c3,
         |         SUM(CASE WHEN j % 3 = 0 THEN b END) AS c4,
         |         SUM(CASE WHEN j % 3 = 1 THEN b END) AS c5,
         |         SUM(CASE WHEN j % 3 = 2 THEN b END) AS c6
         |  FROM vid_b GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT asset_id, kind, CAST(n_bytes AS INTEGER) AS n_bytes,
         |       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
         |       CAST(c3 AS BIGINT) AS c3, CAST(c4 AS BIGINT) AS c4,
         |       CAST(c5 AS BIGINT) AS c5, CAST(c6 AS BIGINT) AS c6
         |FROM (SELECT * FROM img_out UNION ALL SELECT * FROM au_out
         |      UNION ALL SELECT * FROM vid_out)""".stripMargin),
    "mm_decode_audio" ->
      ("""WITH au AS (
         |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n
         |  FROM documents
         |  WHERE doc_id % 3 = 1 AND length(text) >= 1
         |    AND length(text) = octet_length(encode(text))),
         |sm AS (
         |  SELECT doc_id, n, (ascii(text[CAST(i AS INTEGER) + 1]) - 128) * 256 AS s
         |  FROM au, unnest(range(0, n)) AS t(i))
         |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_samples,
         |       CAST(SUM(s) AS BIGINT) AS sample_sum,
         |       CAST(SUM(s * s) AS BIGINT) AS sample_sq_sum
         |FROM sm GROUP BY 1, 2""".stripMargin),
    "mm_decode_video" ->
      ("""WITH v AS (
         |  SELECT doc_id, text, OCTET_LENGTH(ENCODE(text)) AS n,
         |         OCTET_LENGTH(ENCODE(text)) % 24 + 8 AS w,
         |         OCTET_LENGTH(ENCODE(text)) % 16 + 8 AS h,
         |         OCTET_LENGTH(ENCODE(text)) % 3 + 2 AS nf
         |  FROM documents
         |  WHERE doc_id % 3 = 2 AND length(text) >= 1
         |    AND length(text) = octet_length(encode(text))),
         |px AS (
         |  SELECT doc_id, w, h, nf, n, text, unnest(range(0, nf * w * h * 3)) AS j
         |  FROM v)
         |SELECT doc_id AS asset_id, CAST(nf AS INTEGER) AS n_frames,
         |       CAST(w AS INTEGER) AS dec_w, CAST(h AS INTEGER) AS dec_h,
         |       CAST(SUM(ascii(text[
         |         CAST((CAST(j // (w * h * 3) AS INTEGER) * 31 + j % (w * h * 3)) % n
         |           AS INTEGER) + 1])) AS BIGINT) AS px_sum
         |FROM px GROUP BY 1, 2, 3, 4""".stripMargin),
    "ngram_jaccard_pairs" ->
      (s"""WITH ${duckShingleDocsCte(25)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |         len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM d a, d b WHERE a.doc_id < b.doc_id""".stripMargin),
    "sim_ann_xcheck" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS lsh_top1, " +
       "CAST(vec_id + 100000 AS BIGINT) AS ivf_top1, " +
       "true AS lsh_self, true AS ivf_self " +
       "FROM embeddings WHERE vec_id < 8"),
    "sim_standing_index" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS top1, true AS found_planted " +
       "FROM embeddings WHERE vec_id < 8"),
    "sim_standing_pq" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS pq_top1, true AS pq_self " +
       "FROM embeddings WHERE vec_id < 8"),
    "sim_standing_ivfpq" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS ivfpq_top1, true AS ivfpq_self " +
       "FROM embeddings WHERE vec_id < 8"),
    "sim_semdedup" ->
      ("SELECT vec_id, true AS orig_kept, false AS dup_kept, " +
       "vec_id AS dup_of FROM embeddings WHERE vec_id < 8"),
    "sim_pq_xcheck" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS pq_top1, true AS pq_self " +
       "FROM embeddings WHERE vec_id < 8"),
    "sim_ivfpq_xcheck" ->
      ("SELECT vec_id AS query_id, " +
       "CAST(vec_id + 100000 AS BIGINT) AS ivfpq_top1, true AS ivfpq_self " +
       "FROM embeddings WHERE vec_id < 8"),
    "embed_knn_classifier" ->
      s"WITH $KnnPredsCtes\nSELECT query_id, true_label, pred_label FROM preds",
    "eval_classifier_metrics" ->
      (s"""WITH $KnnPredsCtes,
         |t AS (
         |  SELECT true_label AS label, COUNT(*) AS support,
         |         SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS tp
         |  FROM preds GROUP BY 1),
         |p AS (
         |  SELECT pred_label AS label,
         |         SUM(CASE WHEN pred_label <> true_label THEN 1 ELSE 0 END) AS fp
         |  FROM preds GROUP BY 1)
         |SELECT COALESCE(t.label, p.label) AS label,
         |       CAST(COALESCE(support, 0) AS BIGINT) AS support,
         |       CAST(COALESCE(tp, 0) AS BIGINT) AS tp,
         |       CAST(COALESCE(fp, 0) AS BIGINT) AS fp,
         |       CAST(COALESCE(support, 0) - COALESCE(tp, 0) AS BIGINT) AS fn
         |FROM t FULL OUTER JOIN p ON t.label = p.label""".stripMargin),
    "embed_centroid_classifier" ->
      ("""WITH ex AS (
         |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
         |         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos
         |  FROM embeddings),
         |cent AS (
         |  SELECT label AS clabel, pos,
         |         SUM(ROUND(x * 1e6)) / COUNT(*) / 1e6 AS cx
         |  FROM ex GROUP BY 1, 2),
         |dist AS (
         |  SELECT e.vec_id, c.clabel,
         |         CAST(SUM(ROUND((e.x - c.cx) * (e.x - c.cx) * 1e6)) AS BIGINT)
         |           AS d_micro
         |  FROM ex e JOIN cent c ON e.pos = c.pos
         |  GROUP BY 1, 2),
         |best AS (
         |  SELECT vec_id, clabel,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id
         |           ORDER BY d_micro ASC, clabel ASC) AS rn
         |  FROM dist)
         |SELECT e.vec_id, e.label AS true_label, b.clabel AS pred_label
         |FROM embeddings e JOIN best b ON e.vec_id = b.vec_id
         |WHERE b.rn = 1""".stripMargin),
    "embed_stats" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
       "list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS sq_norm, " +
       "list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS sum_v, " +
       "list_max(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS max_v " +
       "FROM embeddings"),
    "embed_normalize" ->
      ("""WITH t AS (
         |  SELECT vec_id, embedding,
         |         sqrt(list_sum(list_transform(embedding,
         |           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |x AS (
         |  SELECT vec_id, nrm, embedding,
         |         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS idx
         |  FROM t WHERE nrm > 0)
         |SELECT vec_id, idx, CAST(embedding[idx + 1] AS DOUBLE) / nrm AS nv
         |FROM x""".stripMargin),
    "embed_quantize_int8" ->
      ("""WITH t AS (
         |  SELECT vec_id, embedding,
         |         list_max(list_transform(embedding, v -> ABS(CAST(v AS DOUBLE)))) AS m
         |  FROM embeddings WHERE list_max(list_transform(embedding, v -> ABS(CAST(v AS DOUBLE)))) > 0),
         |x AS (
         |  SELECT vec_id, m, embedding,
         |         CAST(unnest(range(0, len(embedding))) AS INTEGER) AS idx
         |  FROM t)
         |SELECT vec_id, idx,
         |       CAST(FLOOR(CAST(embedding[idx + 1] AS DOUBLE) * 127.0 / m + 0.5) AS INTEGER) AS q
         |FROM x""".stripMargin),
    "embed_srp_project" ->
      ("""SELECT vec_id, CAST(j AS INTEGER) AS j,
         |  0.125 * list_sum(list_transform(range(0, len(embedding)), i ->
         |    CASE WHEN ((i * 73 + j * 151 + i * j * 11) % 97) % 2 = 0
         |         THEN CAST(embedding[i + 1] AS DOUBLE)
         |         ELSE -CAST(embedding[i + 1] AS DOUBLE) END)) AS p
         |FROM embeddings, range(16) t(j)""".stripMargin),
    "dedup_keep_best" ->
      (s"""WITH RECURSIVE ${duckShingleDocsCte(25)},
         |e0 AS (
         |  SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)) >= 0.4),
         |edges AS (SELECT ea, eb FROM e0 UNION ALL SELECT eb, ea FROM e0),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT e.ea, reach.r FROM edges e JOIN reach ON e.eb = reach.id),
         |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
         |q AS (SELECT doc_id, CAST(LEN(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens
         |      FROM documents WHERE doc_id < 25)
         |SELECT component, doc_id AS keep_id, n_members, best_n_tokens FROM (
         |  SELECT c.component, c.doc_id,
         |         row_number() OVER (PARTITION BY c.component
         |                            ORDER BY q.n_tokens DESC, c.doc_id) AS rn,
         |         CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_members,
         |         MAX(q.n_tokens) OVER (PARTITION BY c.component) AS best_n_tokens
         |  FROM comp c JOIN q USING (doc_id))
         |WHERE rn = 1""".stripMargin),
    "dedup_cc_groups" ->
      (s"""WITH RECURSIVE ${duckShingleDocsCte(25)},
         |e0 AS (
         |  SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)) >= 0.4),
         |edges AS (SELECT ea, eb FROM e0 UNION ALL SELECT eb, ea FROM e0),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT e.ea, reach.r FROM edges e JOIN reach ON e.eb = reach.id)
         |SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id""".stripMargin),
    "sample_split_group" ->
      (s"""WITH RECURSIVE ${duckShingleDocsCte(25)},
         |e0 AS (
         |  SELECT a.doc_id AS ea, b.doc_id AS eb
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)) >= 0.4),
         |edges AS (SELECT ea, eb FROM e0 UNION ALL SELECT eb, ea FROM e0),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM d
         |  UNION
         |  SELECT e.ea, reach.r FROM edges e JOIN reach ON e.eb = reach.id),
         |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
         |SELECT doc_id, component,
         |       substr(md5('gsplit:' || component), 1, 1)
         |         IN ('0', '1', '2', '3') AS is_eval
         |FROM comp""".stripMargin),
    // Full cross-engine recompute of the bigram LM self-score: same
    // normalization (explicit class ≡ Java \s), per-doc code-point bigram
    // counts, corpus counts, add-one smoothing over first-char totals +
    // observed vocab, per-doc mean NLL — compared at micro-NLL precision.
    "text_lm_score" ->
      ("""WITH n AS (
         |  SELECT doc_id, lower(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS s
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, substr(s, CAST(i AS INTEGER), 2) AS b
         |  FROM n, unnest(range(1, length(s))) AS t(i)),
         |dc AS (SELECT doc_id, b, COUNT(*) AS nb FROM bg GROUP BY 1, 2),
         |cc AS (SELECT b, SUM(nb) AS c_ab FROM dc GROUP BY 1),
         |pt AS (SELECT substr(b, 1, 1) AS p, SUM(c_ab) AS c_a FROM cc GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT ch) AS v FROM (
         |         SELECT substr(b, 1, 1) AS ch FROM cc
         |         UNION ALL SELECT substr(b, 2, 1) FROM cc)),
         |model AS (
         |  SELECT cc.b, ln((cc.c_ab + 1) / (pt.c_a + vv.v)) AS log_p
         |  FROM cc JOIN pt ON substr(cc.b, 1, 1) = pt.p CROSS JOIN vv)
         |SELECT dc.doc_id,
         |       CAST(ROUND(-(SUM(dc.nb * m.log_p)) / SUM(dc.nb) * 1000000) AS BIGINT)
         |         AS nll_micro,
         |       CAST(SUM(dc.nb) AS BIGINT) AS n_bigrams
         |FROM dc JOIN model m ON dc.b = m.b
         |GROUP BY dc.doc_id""".stripMargin),
    "events_windowed_agg" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, " +
       "event_type, CAST(COUNT(*) AS BIGINT) AS n_events, " +
       "SUM(ROUND(value * 100)) / 100.0 AS total_value " +
       "FROM events GROUP BY 1, 2"),
    "events_hop_window" ->
      ("""WITH hops AS (
         |  SELECT e.event_type, e.ts, o.off
         |  FROM events e, (VALUES (0), (1800)) o(off)),
         |assigned AS (
         |  SELECT event_type,
         |    to_timestamp(CAST(floor((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off)
         |      AS window_start,
         |    ts, off
         |  FROM hops)
         |SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
         |       CAST(COUNT(*) AS BIGINT) AS n_events
         |FROM assigned GROUP BY 1, 2""".stripMargin),
    "events_session_window" ->
      ("""WITH marked AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts,
         |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |                        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked)
         |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
         |       CAST(COUNT(*) AS BIGINT) AS n_events
         |FROM sess GROUP BY user_id, sid""".stripMargin),
    "events_interval_join" ->
      ("""SELECT c.event_id AS click_id, c.user_id,
         |       CAST(c.ts AS TIMESTAMP) AS click_ts,
         |       v.event_id AS view_id, CAST(v.ts AS TIMESTAMP) AS view_ts
         |FROM events c JOIN events v
         |  ON c.event_type = 'click' AND v.event_type = 'view'
         | AND c.user_id = v.user_id
         | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE""".stripMargin),
    "events_json_extract" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
       "FROM events"),
    "sim_hybrid_rrf" -> HybridRrfOracle,
    "sim_hybrid_standing" -> HybridRrfOracle,
    "sim_mmr_rerank" -> MmrOracle,
    "pipeline_gold_e2e" ->
      ("""WITH o AS (
         |  SELECT *, CAST(o_orderkey % 4 AS INTEGER) AS data_block_id
         |  FROM orders WHERE o_totalprice <> 0),
         |li AS (SELECT DISTINCT * FROM lineitem),
         |g AS (
         |  SELECT l_orderkey, CAST(l_orderkey % 4 AS INTEGER) AS li_block,
         |         SUM(l_quantity) AS sum_qty,
         |         SUM(ROUND(l_extendedprice * (1 - l_discount) * 100)) / 100.0 AS revenue,
         |         CAST(COUNT(*) AS BIGINT) AS line_cnt
         |  FROM li GROUP BY 1, 2)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
         |       o.o_orderdate, o.o_orderpriority, o.data_block_id,
         |       g.sum_qty, g.revenue, g.line_cnt
         |FROM o LEFT JOIN g
         |  ON o.o_orderkey = g.l_orderkey AND o.data_block_id = g.li_block""".stripMargin)
  )
}
