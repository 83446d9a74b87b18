package graft.text

import graft.SparkSpec

/** BPE merge training: the hand-computed tokenizer-tutorial corpus pins
  * interacting merges (a merged symbol joins later pair counts — the case
  * the `text_bpe_train_xcheck` oracle's non-interacting slice cannot
  * reach), and a repeated-character word pins the greedy left-to-right
  * non-overlapping application.
  */
class BpeTrainerSpec extends SparkSpec {

  private def wf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("word", "freq")
  }

  test("merge list matches the hand computation, merged symbols re-enter counts") {
    // hug×10 pug×5 pun×12 bun×4 hugs×5:
    //   (u,g)=20 → ug; (u,n)=16 → un; (h,ug)=15 → hug (REQUIRES the
    //   round-1 merge to have re-entered the pair table); (p,un)=12;
    //   then a 5-5 tie between (hug,s) and (p,ug) breaks to (hug,s) on
    //   lexicographic left.
    val merges = BpeTrainer.train(
      wf("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L, "hugs" -> 5L), 5)
    assert(merges.map(m => (m.rank, m.left, m.right, m.nOccurrences)) ==
      Seq((1, "u", "g", 20L), (2, "u", "n", 16L), (3, "h", "ug", 15L),
        (4, "p", "un", 12L), (5, "hug", "s", 5L)))
  }

  test("greedy left-to-right: a fresh merge never overlaps itself in one pass") {
    // aaaa×3: (a,a) counts 3 adjacencies ×3 = 9; applying it greedily
    // yields [aa, aa] (never [aa, a] + a re-merge), so round 2 finds
    // (aa,aa)=3 and round 3 finds nothing — early exhaustion.
    val merges = BpeTrainer.train(wf("aaaa" -> 3L), 5)
    assert(merges.map(m => (m.rank, m.left, m.right, m.nOccurrences)) ==
      Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("encode applies merges in rank order (tokenizer inference rule)") {
    import spark.implicits._
    val merges = BpeTrainer.train(
      wf("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L, "hugs" -> 5L), 5)
    val enc = BpeTrainer.encode(
      Seq("hugs", "pugs", "bun").toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // "hugs" follows the full chain u+g → h+ug → hug+s; "pugs" has no
    // (hug,s) merge available so the s stays split; "bun" only gets un.
    assert(enc("hugs") == Seq("hugs"))
    assert(enc("pugs") == Seq("p", "ug", "s"))
    assert(enc("bun") == Seq("b", "un"))
  }

  test("single-symbol and empty words are inert") {
    val merges = BpeTrainer.train(wf("a" -> 100L, "b" -> 50L, "xy" -> 2L), 3)
    assert(merges.map(m => (m.left, m.right, m.nOccurrences)) == Seq(("x", "y", 2L)))
  }

  test("property: encoding reconstructs every word exactly (random corpora)") {
    import spark.implicits._
    // Segmentation must be a PARTITION of the word: whatever the trained
    // merges, concatenating a word's symbols yields the word back, and no
    // symbol is empty. One deterministic sweep over seeded random corpora
    // (the invariant a tokenizer must never break — lost or duplicated
    // characters corrupt every downstream token count).
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcde"
      val words = Seq.fill(30)(
        (1 to (1 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct.map(w => w -> (1L + rnd.nextInt(20)))
      val merges = BpeTrainer.train(words.toDF("word", "freq"), 8)
      val enc = BpeTrainer.encode(words.map(_._1).toDF("word"), merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1))
      assert(enc.nonEmpty)
      enc.foreach { case (w, syms) =>
        assert(syms.mkString == w, s"seed=$seed: '$w' re-segmented to $syms")
        assert(syms.forall(_.nonEmpty), s"seed=$seed: empty symbol in $syms for '$w'")
      }
    }
  }
}
