package graft.ops

import graft.SparkSpec
import graft.similarity.{Similarity, StandingAnnIndex}
import org.apache.spark.sql.functions._

/** Persisted standing ANN index: recall vs brute force after incremental
  * ingests, tag-idempotent replays, and frozen centroids across ingest.
  */
class StandingAnnIndexSpec extends SparkSpec {

  private def clustered(n: Int, clusters: Int, dims: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(clusters)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val per = n / clusters
    (for (c <- 0 until clusters; i <- 0 until per) yield {
      val id = c * per + i
      val jitter = new scala.util.Random(id)
      (id.toLong, centers(c).map(x => x + 0.05f * jitter.nextGaussian().toFloat).toSeq)
    }).toDF("vec_id", "embedding")
  }

  test("index built by train + two ingests reaches brute-force-level recall") {
    import spark.implicits._
    val emb = clustered(300, 10, 16)
    val idx = new StandingAnnIndex(spark, tmpDir("ann_idx_recall"))
    idx.train(emb.filter($"vec_id" < 120), nCentroids = 20)
    idx.ingest(emb.filter($"vec_id" >= 120 && $"vec_id" < 210), tag = 1L)
    idx.ingest(emb.filter($"vec_id" >= 210), tag = 2L)
    assert(idx.vectorTable.read.count() == 300)
    val pred = col("vec_id") % 30 === 0
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = idx.query(emb.filter(pred), 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"standing-index recall too low: $recall")
  }

  test("PQ mode: planted copy is ADC-top-1; replay skipped; books frozen") {
    import spark.implicits._
    val emb = clustered(240, 8, 16)
    val idx = new StandingAnnIndex(spark, tmpDir("ann_idx_pq"))
    idx.trainPq(emb.filter($"vec_id" < 120), m = 4, kCent = 12)
    val booksBefore = idx.codebookTable.read.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSet
    // second batch carries exact copies of 3 query vectors under new ids
    val dups = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 9000).as("vec_id"), $"embedding")
    idx.ingestPq(emb.filter($"vec_id" >= 120).unionByName(dups), tag = 4L)
    val n1 = idx.codeTable.read.count()
    idx.ingestPq(emb.filter($"vec_id" >= 120).unionByName(dups), tag = 4L)
    assert(idx.codeTable.read.count() == n1, "replayed tag must not re-append")
    val booksAfter = idx.codebookTable.read.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2))).toSet
    assert(booksAfter == booksBefore, "ingestPq must never retrain codebooks")
    val top1 = idx.queryPq(emb.filter($"vec_id" < 3), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 3L).foreach { q =>
      assert(top1(q) == q + 9000, s"query $q: expected planted copy, got ${top1(q)}")
    }
  }

  test("replayed ingest tag is skipped; centroids stay frozen across ingest") {
    import spark.implicits._
    val emb = clustered(200, 5, 8)
    val idx = new StandingAnnIndex(spark, tmpDir("ann_idx_replay"))
    idx.train(emb.filter($"vec_id" < 100), nCentroids = 10)
    val centsBefore = idx.centroidTable.read.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    idx.ingest(emb.filter($"vec_id" >= 100), tag = 7L)
    val n1 = idx.vectorTable.read.count()
    idx.ingest(emb.filter($"vec_id" >= 100), tag = 7L) // at-least-once replay
    assert(idx.vectorTable.read.count() == n1, "replayed tag must not re-append")
    val centsAfter = idx.centroidTable.read.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(centsAfter == centsBefore, "ingest must never move centroids")
    assertThrows[IllegalArgumentException](idx.ingest(emb, tag = 0L))
  }
}
