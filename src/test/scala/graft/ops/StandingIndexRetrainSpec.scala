package graft.ops

import graft.SparkSpec
import graft.similarity.{Similarity, StandingAnnIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The re-train cadence the StandingAnnIndex scaladoc promises, measured:
  * frozen centroids trained on the bootstrap distribution lose recall as
  * ingested batches drift to NEW clusters the centroid set never saw;
  * one [[StandingAnnIndex.retrain]] re-fits the centroids to the current
  * corpus and rebuilds every assignment (batch_tags preserved), and
  * recall at the same nProbe recovers. Numbers recorded in SCALING.md.
  */
class StandingIndexRetrainSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  /** `n` vectors around axis-aligned cluster directions `axes` (axis a
    * scaled to 10 + small deterministic jitter), ids starting at `base`,
    * round-robin across clusters so low ids cover every cluster.
    */
  private def around(axes: Seq[Int], n: Int, base: Long): DataFrame = {
    (0 until n).map { i =>
      val axis = axes(i % axes.size)
      val rnd = new scala.util.Random(base + i)
      val v = Array.tabulate(dims)(d =>
        (if (d == axis) 10.0f else 0.0f) + 0.3f * rnd.nextGaussian().toFloat)
      (base + i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def recallAt(idx: StandingAnnIndex, corpus: DataFrame,
      pred: org.apache.spark.sql.Column, k: Int, nProbe: Int): Double = {
    val exact = Similarity.bruteForceTopK(corpus, pred, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = idx.query(corpus.filter(pred), k, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact intersect approx).size.toDouble / exact.size
  }

  test("drifted ingests decay recall; retrain recovers it with tags preserved") {
    val bootstrap = around(Seq(0, 1, 2, 3), 120, base = 0L)
    // drifted batches: four NEW orthogonal cluster axes the bootstrap
    // (and so the frozen centroids) never saw — their members' cell
    // assignment under the old centroids is jitter-noise, so same-cluster
    // neighbors scatter across cells
    val drift1 = around(Seq(4, 5, 6, 7), 80, base = 1000L)
    val drift2 = around(Seq(4, 5, 6, 7), 80, base = 2000L)
    val corpus = bootstrap.unionByName(drift1).unionByName(drift2)

    val idx = new StandingAnnIndex(spark, tmpDir("ann_retrain"))
    idx.train(bootstrap, nCentroids = 8, iterations = 2)
    idx.ingest(drift1, tag = 1L)
    idx.ingest(drift2, tag = 2L)

    // queries from the drifted clusters; truth = brute force on the
    // current corpus
    val pred = col("vec_id") >= 1000L && col("vec_id") < 1008L
    val before = recallAt(idx, corpus, pred, k = 5, nProbe = 1)

    // the drift monitor fires BEFORE anyone has to notice decayed recall:
    // the drifted batches' occupancy diverged from the train-time shape
    val score = idx.driftScore()
    info(f"drift score after drifted ingests: $score%.3f")
    assert(idx.retrainDue(), s"monitor must fire on the drift scenario ($score)")

    idx.retrain(nCentroids = 8, iterations = 3)
    val after = recallAt(idx, corpus, pred, k = 5, nProbe = 1)
    // retrain refreshed the reference distribution: the monitor re-arms
    assert(idx.driftScore() == 0.0, "nothing ingested since retrain")
    assert(!idx.retrainDue())

    info(f"recall@5 nProbe=1: before retrain $before%.2f, after $after%.2f")
    assert(before <= 0.7, s"drift scenario too easy: before=$before")
    assert(after >= before + 0.25, s"retrain must recover recall: $before -> $after")
    assert(after >= 0.9, s"retrained recall too low: $after")

    // the rebuild preserved rows and their batch_tags
    val tags = idx.vectorTable.read.groupBy("batch_tag").count()
      .collect().map(r => r.getAs[Number]("batch_tag").longValue() -> r.getLong(1)).toMap
    assert(tags == Map(0L -> 120L, 1L -> 80L, 2L -> 80L), s"tags after retrain: $tags")
    // and a replayed tag is still skipped against the rebuilt table
    idx.ingest(drift2, tag = 2L)
    assert(idx.vectorTable.read.count() == 280)
  }

  test("stationary ingests keep the drift monitor quiet") {
    val idx = new StandingAnnIndex(spark, tmpDir("ann_quiet"))
    idx.train(around(Seq(0, 1, 2, 3), 120, base = 0L), nCentroids = 8,
      iterations = 2)
    // same four clusters, new rows: the occupancy shape is reproduced
    idx.ingest(around(Seq(0, 1, 2, 3), 80, base = 1000L), tag = 1L)
    idx.ingest(around(Seq(0, 1, 2, 3), 80, base = 2000L), tag = 2L)
    val score = idx.driftScore()
    info(f"drift score under stationary ingests: $score%.3f")
    assert(!idx.retrainDue(),
      s"monitor must stay quiet on stationary ingests (score $score)")
    assert(score < 0.15, s"stationary score unexpectedly high: $score")
  }
}
