package graft.ops

import graft.SparkSpec
import graft.dedup.Winnowing
import graft.similarity.{Ivf, SemDeDup, Similarity}
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

  test("recall is monotone in nProbe — the multi-probe knob (1, 2, 4)") {
    import spark.implicits._
    // Probed cells are nested (top-1 ⊆ top-2 ⊆ top-4 by centroid sim), so
    // the candidate set only grows and recall vs brute force cannot drop —
    // the invariant that makes nProbe a safe recall/cost dial at 100 TB
    // (probe 2-8 cells instead of re-clustering). Figures → SCALING.md.
    val rnd = new scala.util.Random(37)
    val centers = Array.fill(12)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 12; i <- 0 until 25) yield {
      val id = c * 25 + i
      val j = new scala.util.Random(500 + id)
      // heavy jitter: clusters OVERLAP, so true neighbors straddle cell
      // boundaries and nProbe=1 demonstrably misses some
      (id.toLong, centers(c).map(x => x + 0.9 * j.nextGaussian()).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val pred = col("vec_id") % 25 === 0
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4).map { np =>
      val approx = Ivf.topK(emb, pred, 5, nCentroids = 12, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> (exact intersect approx).size.toDouble / exact.size
    }
    info(s"recall vs nProbe: ${recalls.map { case (n, r) => s"$n→${"%.3f".format(r)}" }.mkString(", ")}")
    recalls.sliding(2).foreach { case Seq((nl, rl), (nh, rh)) =>
      assert(rh >= rl, s"recall must be monotone in nProbe: $nl→$rl but $nh→$rh")
    }
    assert(recalls.last._2 >= 0.9, s"nProbe=4 recall too low: ${recalls.last._2}")
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

class SemDeDupSpec extends SparkSpec {
  test("semantic duplicates drop greedily to the lowest id; distinct vectors survive") {
    import spark.implicits._
    // 40 well-separated random vectors, plus exact copies of 3 of them
    // and a near-parallel copy (same direction, different magnitude —
    // cosine 1) of a fourth, all under higher ids.
    val base = (0 until 40).map { i =>
      val r = new scala.util.Random(100 + i)
      (i.toLong, Seq.fill(16)(r.nextGaussian().toFloat))
    }
    val copies = Seq(3L, 11L, 25L).map(i => (i + 1000L, base(i.toInt)._2)) :+
      (1040L, base(7)._2.map(x => x * 2.5f))
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val dec = SemDeDup.decisions(emb, nCentroids = 8, tau = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    for (orig <- Seq(3L, 11L, 25L, 7L))
      assert(dec(orig) == (true, -1L), s"original $orig must survive: ${dec(orig)}")
    for ((copy, orig) <- Seq(1003L -> 3L, 1011L -> 11L, 1025L -> 25L, 1040L -> 7L))
      assert(dec(copy) == (false, orig), s"copy $copy must drop to $orig: ${dec(copy)}")
    assert(dec.size == 44 && dec.count(_._2._1) == 40)
    // dedup() keeps exactly the survivors, schema preserved
    val kept = SemDeDup.dedup(emb, nCentroids = 8, tau = 0.95)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
    assert(kept.select("vec_id").as[Long].collect().toSet ==
      dec.filter(_._2._1).keySet)
  }

  test("within-cell pair join is an equi-join — no cartesian over the corpus") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dec = SemDeDup.decisions(emb, nCentroids = 8, tau = 0.9)
    val plan = dec.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    // the only BNLJ allowed is the bounded broadcast(centroids) assignment,
    // which feeds BOTH sides of the self-join (≤ 2 occurrences); the pair
    // join itself must be a hash/merge equi-join on cell_id
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"corpus-side BNLJ leaked into the pair join:\n$plan")
    assert(Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .exists(plan.contains), s"pair join is not an equi-join:\n$plan")
    assert(dec.count() == emb.count())
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
