package graft.operators

import graft.SparkSpec
import graft.similarity.IvfPq
import org.apache.spark.sql.functions._

/** IVF-PQ composite: cluster-membership recall (the PqSpec yardstick —
  * code-granular quantization tie-breaks within a tight cluster, so
  * cluster membership, not element recall, is the quantization promise)
  * plus determinism. Exact-copy decisions are oracle-checked by the
  * driver via `sim_ivfpq_xcheck`.
  */
class IvfPqSpec extends SparkSpec {

  private def clustered(nClusters: Int, per: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = for (c <- 0 until nClusters; i <- 0 until per) yield {
      val id = c * per + i
      val jitter = new scala.util.Random(id)
      (id.toLong, centers(c).map(x => x + 0.05f * jitter.nextGaussian().toFloat).toSeq, c)
    }
    vecs.toDF("vec_id", "embedding", "label")
  }

  test("ADC neighbors land in the query's own cluster through the cell+residual path") {
    val emb = clustered(12, 20, 16)
    val labels = emb.select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = IvfPq.topK(emb, col("vec_id") % 20 === 0, k = 5,
        nCells = 12, nProbe = 2, m = 4, kCent = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val inCluster = rows.count { case (q, n) => labels(q) == labels(n) }
    val frac = inCluster.toDouble / rows.length
    assert(frac >= 0.9, s"only $frac of IVF-PQ neighbors share the query's cluster")
  }

  test("ranking is deterministic across runs (integer ADC keys, seeded training)") {
    val emb = clustered(8, 15, 16)
    def run() = IvfPq.topK(emb, col("vec_id") < 8, k = 3,
        nCells = 8, nProbe = 2, m = 4, kCent = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(identity).toSeq
    assert(run() == run())
  }
}
