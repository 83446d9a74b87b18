package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * final step of near-duplicate dedup: LSH/Jaccard emits PAIRS, but the
  * corpus decision needs CLUSTERS ("these 7 docs are one document; keep
  * the smallest id"). Transitivity matters: A~B and B~C put A and C in
  * one cluster even if the A–C pair was never emitted.
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with its
  * own id; each round every vertex takes the min of its own label and its
  * neighbors' labels; converges when no label changes. Each round is one
  * equi-join + one hash aggregate — both plain shuffles on the vertex id,
  * no driver-side graph state (the driver sees only the per-round changed
  * COUNT). Rounds needed = graph diameter, and near-dup graphs are
  * overwhelmingly tiny cliques/chains (diameter ≤ ~3), so 2-4 rounds in
  * practice; `maxIter` caps pathological chains. `localCheckpoint`
  * truncates the per-round lineage so the plan does not grow with
  * iterations (same discipline as [[graft.operators.PrefixSum]]).
  *
  * At 100 TB: state per round is |V| (id, label) pairs plus the |E| join —
  * linear shuffles, AQE-sizeable. For graphs with genuinely large
  * diameters (not the dedup case) the star-contraction variants halve the
  * round count; documented trade-off, not needed here.
  */
object ConnectedComponents {

  /** Labels every vertex with the smallest vertex id reachable from it.
    *
    * @param edges    undirected edge list (each pair once is enough)
    * @param srcCol   source id column (long-compatible)
    * @param dstCol   destination id column
    * @param vertices optional vertex universe — isolated vertices (no
    *                 edges) only appear in the output if supplied here
    * @return (id, component) — component = min reachable id
    */
  def components(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      vertices: Option[DataFrame] = None,
      maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // The checkpointed blocks to release are identified from the RETURNED
    // DataFrame's own plan (its LogicalRDD leaf holds the checkpointed
    // RDD), never by diffing sc.getPersistentRDDs around the call — under
    // a shared SparkContext with concurrent jobs (Pipeline.inParallel, a
    // draining watchdog-cancelled query) the diff could capture a FOREIGN
    // job's checkpoint and later unpersist it out from under that job
    // (round-5 review finding).
    type Release = () => Unit
    def ckpt(df: DataFrame): (DataFrame, Release) = {
      val out = df.localCheckpoint(false) // lazy: materialized by the next action
      val rdds = out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      (out, () => rdds.foreach(_.unpersist(false)))
    }
    def release(r: Release): Unit = r()
    // Symmetrize once: propagation below only follows a->b edges.
    val (e, eRelease) = ckpt(
      edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
        .distinct())
    val endpointIds = e.select($"a".as("id")).distinct()
    val allIds = vertices match {
      case Some(v) =>
        val vc = v.columns.head
        v.select(col(vc).cast("long").as("id")).distinct()
          .union(endpointIds).distinct()
      case None => endpointIds
    }
    // Seed with min(id, direct neighbors): the common near-dup shapes
    // (cliques, stars) then converge in one verification round instead of
    // two propagation rounds — and each saved round is a saved Spark job.
    val nbrSeed = e.groupBy($"a".as("id")).agg(min($"b").as("nmin"))
    // Per-round checkpoints must be RELEASED once the next round no longer
    // reads them, or |V|-sized blocks accumulate in executor storage — one
    // dead copy of the labels per iteration (terabytes on a long-diameter
    // 100 TB run). The handle comes from the checkpointed frame's own
    // LogicalRDD leaf (see ckpt above). A round's blocks are released only
    // AFTER the following round has materialized (lineage is truncated —
    // unpersisting a still-needed local checkpoint would be
    // unrecoverable, not just slow).
    var (labels, labelRelease) = ckpt(
      allIds.join(nbrSeed, Seq("id"), "left")
        .select($"id", least($"id", coalesce($"nmin", $"id")).as("comp")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // Neighbor labels flow along edges; a vertex keeps the min of its
      // own label and everything that arrived. The changed-count rides on
      // the same materialization (lazy checkpoint + one count action per
      // round) — iterative Spark pays per-round job latency, so rounds
      // and actions-per-round are both kept minimal.
      val nbrMin = e.join(labels, e("b") === labels("id"))
        .groupBy(e("a").as("id")).agg(min(labels("comp")).as("nmin"))
      val (next, nextRelease) = ckpt(
        labels.join(nbrMin, Seq("id"), "left")
          .select($"id",
            least($"comp", coalesce($"nmin", $"comp")).as("comp"),
            coalesce($"nmin" < $"comp", lit(false)).as("chg")))
      changed = next.filter($"chg").count() // materializes `next`
      release(labelRelease)                 // previous round: now unreferenced
      labels = next.drop("chg")
      labelRelease = nextRelease
      iter += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIter rounds")
    release(eRelease) // final labels are checkpointed; the edge copy is dead
    labels
  }

  /** Cluster summary for dedup decisions: one row per component with the
    * keeper (min id) and member count — `n_members > 1` are the duplicate
    * groups; everything else survives untouched.
    */
  def clusters(labels: DataFrame): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    labels.groupBy($"comp".as("keep_id"))
      .agg(count(lit(1)).as("n_members"), max($"id").as("max_id"))
  }
}
