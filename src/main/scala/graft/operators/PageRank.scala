package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in MICRO-INTEGER arithmetic — link-graph centrality for the
  * curation pipeline (rank co-occurrence/similarity graphs of documents
  * or items; centrality then weights sampling the way quality scores
  * do), exactly-testable by construction.
  *
  * The usual float PageRank cannot be hash-oracled: per-node in-mass is
  * a SUM of doubles whose re-association order differs between engines.
  * Here every rank is a micro-unit long (1.0 ≡ 1,000,000): a node's
  * contribution is `rank_micro * 85 DIV (100 * outdeg)` — one exact
  * integer multiply and one integer division — and in-mass is a sum of
  * LONGS, associative in any order. The same recurrence in DuckDB's
  * `//` arithmetic is therefore bit-identical (`graph_pagerank_copurch`
  * proves it), and a cluster re-run is deterministic regardless of
  * partitioning — the property that makes the operator auditable at
  * 100 TB, where "re-run and diff" is the only affordable validation.
  *
  * Semantics: damped unnormalized PageRank, d = 0.85, uniform base mass
  * 0.15 per node per round (the N-normalized variant just rescales).
  * Dangling mass is dropped (standard simplification; a symmetric edge
  * set — any co-occurrence graph — has none). Scale shape per
  * iteration: one equi-join of edges to the nodes-sized rank relation
  * on src (broadcast when ranks fit, shuffle otherwise), one groupBy
  * dst — the textbook distributed PR step; `localCheckpoint` every few
  * rounds cuts lineage like [[graft.dedup.ConnectedComponents]].
  */
object PageRank {

  /** @param edges (src, dst) directed edge multiset — dedupe first if
    *        multi-edges must not weigh double
    * @return (node, rank_micro) for every node appearing as src or dst
    */
  def rankMicro(edges: DataFrame, iterations: Int,
      checkpointEvery: Int = 4): DataFrame = {
    // One pass over the (possibly expensive) caller edge derivation:
    // out-degree rides along as a per-src window count (no second edge
    // computation for a groupBy+join), and the result materializes ONCE —
    // every iteration re-reads the edge set twice (contribution join +
    // the rank lineage), so without the cut a k-round run recomputes the
    // edge build O(k) times.
    val contribEdges = edges
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(eager = true)
    val nodes = contribEdges.select(col("src").as("node"))
      .union(contribEdges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = true)
    var rank = nodes.withColumn("rank_micro", lit(1000000L))
    for (i <- 1 to iterations) {
      val inMass = contribEdges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank_micro * 85 DIV (100 * outdeg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_micro"))
      rank = nodes.join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("in_micro"), lit(0L))).as("rank_micro"))
      if (i % checkpointEvery == 0 && i < iterations)
        rank = rank.localCheckpoint(eager = true)
    }
    rank
  }
}
