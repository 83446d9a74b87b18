package graft.ops

import graft.SparkSpec
import graft.dedup.Winnowing
import graft.similarity.{Ivf, Similarity}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  test("IVF top-k achieves high recall on clustered vectors, no cross join on corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = for (c <- 0 until 10; i <- 0 until 30) yield {
      val id = c * 30 + i
      val jitter = new scala.util.Random(id)
      (id.toLong, centers(c).map(x => x + 0.05f * jitter.nextGaussian().toFloat).toSeq, c)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") % 30 === 0 // one query per cluster
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.topK(emb, pred, 5, nCentroids = 20, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall too low: $recall")
  }

  test("cell assignment covers every vector exactly once") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = Ivf.withCells(emb, nCentroids = 8)
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())
    assert(cells.select("cell_id").distinct().count() <= 8)
  }

  test("k-means refinement moves centroids toward planted clusters (recall not worse)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(12)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 8; i <- 0 until 25) yield {
      val id = c * 25 + i
      val j = new scala.util.Random(1000 + id)
      (id.toLong, centers(c).map(x => x + 0.08 * j.nextGaussian()).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val pred = col("vec_id") % 25 === 0
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(iters: Int) = {
      val approx = Ivf.topK(emb, pred, 5, nCentroids = 12, nProbe = 2,
        iterations = iters).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val r0 = recallAt(0)
    val r3 = recallAt(3)
    assert(r3 >= r0, s"refinement must not hurt recall: iters0=$r0 iters3=$r3")
    assert(r3 >= 0.8, s"refined IVF recall too low: $r3")
  }
}

class WinnowingSpec extends SparkSpec {
  private val base = "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"

  test("identical docs share all fingerprints; near-dups share most; unrelated few") {
    import spark.implicits._
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // identical
      (3L, base.replace("cat", "owl")),            // near-dup
      (4L, "entirely different content about query planners and shuffle exchanges in distributed engines")
    ).toDF("doc_id", "text")
    val fps = Winnowing.withFingerprints(docs, "doc_id", "text").select($"doc_id", $"fp")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L), "identical docs must fingerprint identically")
    val nearShared = (fps(1L) intersect fps(3L)).size.toDouble / fps(1L).size
    val farShared = (fps(1L) intersect fps(4L)).size.toDouble / fps(1L).size
    assert(nearShared > 0.5, s"near-dup shared ratio $nearShared")
    assert(farShared < 0.2, s"unrelated shared ratio $farShared")
  }

  test("candidatePairs surfaces the planted near-dup via the inverted index") {
    import spark.implicits._
    val docs = Seq(
      (1L, base), (2L, base.replace("lazy", "idle")),
      (3L, "some completely unrelated short text about streams")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.candidatePairs(docs, "doc_id", "text", minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }
}
