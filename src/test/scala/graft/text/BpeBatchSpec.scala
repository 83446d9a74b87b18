package graft.text

import graft.SparkSpec

/** Batched BPE merge selection must be INDISTINGUISHABLE from
  * one-at-a-time greedy training (ranks, pairs, counts — the
  * `text_bpe_train_xcheck` contract), while collapsing driver rounds on
  * merge-disjoint vocabularies. Three angles: random interaction-heavy
  * corpora, a corpus where the new-pair bound guard is the ONLY thing
  * preventing a wrong batch, and the round-count win itself.
  */
class BpeBatchSpec extends SparkSpec {

  private def wf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("word", "freq")
  }

  private def asTuples(ms: Seq[BpeTrainer.Merge]) =
    ms.map(m => (m.rank, m.left, m.right, m.nOccurrences))

  test("batched selection equals sequential on interaction-heavy random corpora") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd" // tiny alphabet → merges constantly interact
      val words = Seq.fill(40)(
        (1 to (2 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.map(w => w -> (1L + rnd.nextInt(30)))
      val sequential = BpeTrainer.train(wf(words), 12, batchSize = 1)
      val batched = BpeTrainer.train(wf(words), 12, batchSize = 8)
      assert(asTuples(batched) == asTuples(sequential), s"seed=$seed diverged")
    }
  }

  test("the new-pair bound guard blocks a disjoint pair a CREATED pair outranks") {
    // (a,b) = 10; its merge creates (ab,c) = 9, which TIES the disjoint
    // candidate (x,y) = 9 and wins the tie lexicographically ("ab" < "x").
    // A batch that accepted (x,y) alongside (a,b) on disjointness alone
    // would rank it 2 — wrong. The bound guard (cnt must be STRICTLY
    // above every accepted pair's adjacent-triple bound, here 9) cuts the
    // batch to [(a,b)] and the next round picks (ab,c) correctly.
    val corpus = Seq("abc" -> 9L, "ab" -> 1L, "xy" -> 9L)
    val sequential = BpeTrainer.train(wf(corpus), 3, batchSize = 1)
    assert(asTuples(sequential) ==
      Seq((1, "a", "b", 10L), (2, "ab", "c", 9L), (3, "x", "y", 9L)))
    val batched = BpeTrainer.train(wf(corpus), 3, batchSize = 8)
    assert(asTuples(batched) == asTuples(sequential))
  }

  test("a merge-disjoint 256-merge vocabulary trains in numMerges/batchSize rounds") {
    // 256 two-symbol words over 512 distinct characters, strictly
    // decreasing frequencies: every candidate pair is disjoint from every
    // other and no word has a triple (bound 0), so each round accepts a
    // full batch — 256 merges in 32 rounds of 8, not 256 rounds.
    val words = (0 until 256).map { i =>
      val w = new String(Array((0x100 + 2 * i).toChar, (0x100 + 2 * i + 1).toChar))
      w -> (10000L - i)
    }
    val (merges, rounds) = BpeTrainer.trainCounted(wf(words), 256, batchSize = 8)
    assert(merges.size == 256)
    assert(rounds <= 256 / 8 + 1, s"expected ~32 rounds, took $rounds")
    // order and counts follow the frequency ranking exactly
    assert(asTuples(merges).take(3) == Seq(
      (1, "Ā", "ā", 10000L),
      (2, "Ă", "ă", 9999L),
      (3, "Ą", "ą", 9998L)))
    assert(merges.last.nOccurrences == 10000L - 255)
  }
}
