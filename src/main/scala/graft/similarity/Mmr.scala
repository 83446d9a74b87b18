package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversification stage a retrieval/curation funnel runs AFTER
  * top-k candidate generation: greedily pick the candidate maximizing
  * relevance minus its worst redundancy against what is already picked.
  * With λ = 0.5 and everything scaled ×2 the arithmetic stays in
  * micro-rounded integers:
  *
  *   score(d | S) = rel_micro(d) − max_{s ∈ S} sim_micro(d, s)
  *   (first pick: rel_micro alone)
  *
  * Scale shape: MMR is inherently sequential (each pick changes the
  * next penalty), so it runs where rerankers always run — on the
  * BOUNDED top-N candidate list, after the distributed stages (ANN /
  * BM25 / hybrid) have reduced the corpus to tens of rows. The pairwise
  * sim matrix is computed IN SPARK with the codegen'd `graft_cosine`
  * (N² ≤ 400 rows for N = 20) and only the micro-rounded integers are
  * collected; the greedy loop then touches integers only — the same
  * driver-bounded class as the ≤k-seed collects in the ANN trainers.
  * The catalog's `sim_mmr_rerank` hash-matches a DuckDB oracle whose 10
  * greedy steps are unrolled CTEs over the same integers.
  */
object Mmr {

  /** Re-rank `candidates` (id, rel_micro, v: array<double>) down to `k`
    * picks. Returns (id, mmr_rank, mmr_score_micro) in pick order.
    * `candidates` must be bounded (a top-N list — enforced loosely to
    * catch accidental corpus-sized inputs).
    */
  def rerank(candidates: DataFrame, k: Int, maxCandidates: Int = 1024): DataFrame = {
    val spark = candidates.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val cand = candidates.select(col("id"), col("rel_micro"), col("v"))
    val rel = cand.select(col("id"), col("rel_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    require(rel.length <= maxCandidates,
      s"MMR is a rerank stage: got ${rel.length} candidates > $maxCandidates")
    val a = cand.select(col("id").as("ia"), col("v").as("va"))
    val b = cand.select(col("id").as("ib"), col("v").as("vb"))
    val sims = a.crossJoin(b).filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        round(call_function("graft_cosine", col("va"), col("vb")) * 1e6)
          .cast("long").as("sim_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val relMap = rel.toMap
    var selected = Vector.empty[(Long, Long)] // (id, score at pick time)
    var remaining = rel.map(_._1).sorted.toVector
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { id =>
        val penalty =
          if (selected.isEmpty) 0L
          else selected.map { case (s, _) => sims((id, s)) }.max
        id -> (relMap(id) - (if (selected.isEmpty) 0L else penalty))
      }
      val (pickId, pickScore) = scored.maxBy { case (id, s) => (s, -id) }
      selected :+= (pickId, pickScore)
      remaining = remaining.filterNot(_ == pickId)
    }
    val rows = selected.zipWithIndex.map { case ((id, s), i) =>
      Row(id, i + 1, s)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("mmr_rank", IntegerType, nullable = false),
        StructField("mmr_score_micro", LongType, nullable = false))))
  }
}
