package graft.operators

import graft.SparkSpec

/** Micro-integer PageRank against hand-computed fixed points: the star
  * graph's exact per-round values, order-independence (determinism is
  * the operator's whole selling point), and the lineage-cut path for
  * deep iteration counts.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
      ckpt: Int = 4): Map[Long, Long] =
    PageRank.rankMicro(edges.toDF("src", "dst"), iters, ckpt)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // hub 0 ↔ leaves 1..4
  private val star =
    (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))

  test("star graph, hand-computed micro values per round") {
    // round 1: leaf = 150000 + (1e6*85) div (100*4)   = 362500
    //          hub  = 150000 + 4*((1e6*85) div 100)   = 3550000
    assert(ranks(star, 1) ==
      Map(0L -> 3550000L, 1L -> 362500L, 2L -> 362500L,
          3L -> 362500L, 4L -> 362500L))
    // round 2: hub  = 150000 + 4*((362500*85) div 100)     = 1382500
    //          leaf = 150000 + (3550000*85) div (100*4)    = 904375
    assert(ranks(star, 2) ==
      Map(0L -> 1382500L, 1L -> 904375L, 2L -> 904375L,
          3L -> 904375L, 4L -> 904375L))
  }

  test("partitioning-independent: same result at any edge order") {
    val shuffled = scala.util.Random.shuffle(star.toList)
    assert(ranks(star, 3) == ranks(shuffled, 3))
  }

  test("deep runs through the lineage cut match the uncut result") {
    assert(ranks(star, 6, ckpt = 2) == ranks(star, 6, ckpt = 100))
  }

  test("asymmetric graph: dangling mass drops, sinks still accumulate") {
    // 1 → 2 → 3 (3 dangles). round 1: n1 = 150000 (no in-edges);
    // n2 = 150000 + 850000 = 1000000; n3 likewise.
    assert(ranks(Seq((1L, 2L), (2L, 3L)), 1) ==
      Map(1L -> 150000L, 2L -> 1000000L, 3L -> 1000000L))
  }
}
