package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (round-8 verdict ask #4): iterates the
  * pair-count pass of `text_bpe_pair_freq` (TextQueries.scala) — count
  * adjacent symbol pairs over the word-frequency table, take the most
  * frequent, merge it everywhere, repeat — to a target number of merges,
  * the loop a real tokenizer pipeline runs to build its vocabulary
  * (reference surfaces only tokenize; this is the training twin).
  *
  * Scale shape: the corpus collapses to its distinct-word VOCABULARY
  * (map-side-combined count) before any per-character work — at 100 TB the
  * vocabulary is MBs while the corpus is TBs — and every iteration is one
  * hash aggregation over that vocabulary plus a narrow map to apply the
  * merge. The winning pair per round is ONE driver-side row
  * (TakeOrderedAndProject limit(1) — parameter-bounded metadata, the same
  * class as [[graft.similarity.Pq]]'s seed probe, not a data collect).
  * Words reduced to a single symbol stop producing pairs and are dropped
  * from the working set, so the iterated table shrinks monotonically.
  * Bounded-iteration lineage is cut with `localCheckpoint` each round
  * (the [[graft.similarity.Pq.trainCodebooks]] pattern).
  *
  * Determinism: ties on pair count break by (left, right) lexicographic
  * order, so the merge list is engine-independent; merge application is
  * the standard greedy left-to-right scan (a fold whose accumulator tail
  * is compared against FULL symbols, so a freshly-merged symbol never
  * re-merges inside the same pass).
  */
object BpeTrainer {

  /** One trained merge: `rank` is the merge order (1-based), the pair
    * `(left, right)` had `nOccurrences` weighted occurrences when chosen.
    */
  final case class Merge(rank: Int, left: String, right: String, nOccurrences: Long)

  /** Splits words into initial character symbols. `wordFreq` must have
    * columns (word: string, freq: long/int).
    */
  private def toSymbols(wordFreq: DataFrame): DataFrame =
    wordFreq.select(col("freq"),
      split(col("word"), "(?!^)(?=.)").as("syms"))

  private def adjacentPairCounts(working: DataFrame): DataFrame =
    working
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right application of one merge to every symbol array:
    * fold each symbol in, collapsing `[..., left] + right` into
    * `[..., left+right]`. Column-lambda form — symbols are data, never
    * spliced into SQL text.
    */
  private def applyMerge(working: DataFrame, l: String, r: String): DataFrame = {
    val merged = l + r
    working.withColumn("syms",
      aggregate(col("syms"), array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x)))))
  }

  /** Max count any NEW pair created by merging (l, r) can have, per
    * candidate pair: a new pair (x, lr) / (lr, y) needs an adjacent
    * triple x·l·r / l·r·y in the stream, so its count is bounded by that
    * triple's count. One aggregate over the working set, max-rolled from
    * both sides. Pairs with no adjacent triple bound at 0.
    */
  private def newPairBounds(working: DataFrame): DataFrame = {
    val triples = working
      .filter(size(col("syms")) >= 3)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i).as("t1"),
            element_at(col("syms"), i + 1).as("t2"),
            element_at(col("syms"), i + 2).as("t3")))).as("t"))
      .groupBy(col("t.t1").as("t1"), col("t.t2").as("t2"), col("t.t3").as("t3"))
      .agg(sum(col("freq")).as("cnt3"))
    triples.select(col("t1").as("l"), col("t2").as("r"), col("cnt3"))
      .unionByName(
        triples.select(col("t2").as("l"), col("t3").as("r"), col("cnt3")))
      .groupBy("l", "r").agg(max(col("cnt3")).as("new_pair_bound"))
  }

  /** Trains `numMerges` merges over a (word, freq) table. Stops early when
    * no adjacent pair remains.
    *
    * Selection is BATCHED but provably identical to one-at-a-time greedy
    * BPE: each round collects the top `batchSize` candidate pairs (with
    * their [[newPairBounds]]) and accepts the maximal sorted PREFIX in
    * which every pair (a) shares no symbol string with an earlier
    * accepted pair or its concatenation — so its measured count and
    * occurrence positions are untouched by applying them — and (b) has
    * count strictly above every accepted pair's new-pair bound — so no
    * pair CREATED by the accepted merges could outrank (or tie) it. Under
    * (a)+(b) the prefix is exactly the next k picks sequential greedy
    * would make, so the merge list (ranks, pairs, counts) is bit-identical
    * to `batchSize = 1` — the equivalence BpeBatchSpec asserts on an
    * interaction-heavy corpus — while driver round trips drop toward
    * numMerges / batchSize on merge-disjoint vocabularies (a 32k-merge
    * production vocab stops costing 32k Spark jobs).
    */
  def train(wordFreq: DataFrame, numMerges: Int, batchSize: Int = 8): Seq[Merge] =
    trainCounted(wordFreq, numMerges, batchSize)._1

  /** [[train]] + the number of driver rounds it took (spec surface). */
  private[text] def trainCounted(wordFreq: DataFrame, numMerges: Int,
      batchSize: Int): (Seq[Merge], Int) = {
    require(batchSize >= 1, "batchSize must be >= 1")
    var working = toSymbols(wordFreq)
      .filter(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var rounds = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val wanted = math.min(batchSize, numMerges - rank + 1)
      val top = adjacentPairCounts(working)
        .join(newPairBounds(working), Seq("l", "r"), "left")
        .select(col("l"), col("r"), col("cnt"),
          coalesce(col("new_pair_bound"), lit(0L)).as("bound"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(wanted).collect()
      rounds += 1
      if (top.isEmpty) exhausted = true
      else {
        // prefix-greedy acceptance: stop at the FIRST candidate that
        // interacts — a later disjoint candidate may NOT be taken, or the
        // batch could leapfrog a still-higher-count sequential pick
        val accepted = Seq.newBuilder[(String, String, Long)]
        val usedSyms = scala.collection.mutable.Set.empty[String]
        var maxBound = Long.MinValue
        var open = true
        top.foreach { row =>
          if (open) {
            val (l, r, cnt, bound) = (row.getString(0), row.getString(1),
              row.getLong(2), row.getLong(3))
            val m = l + r
            val disjoint = usedSyms.isEmpty ||
              (!usedSyms(l) && !usedSyms(r) && !usedSyms(m))
            if (disjoint && (usedSyms.isEmpty || cnt > maxBound)) {
              accepted += ((l, r, cnt))
              usedSyms ++= Seq(l, r, m)
              maxBound = math.max(maxBound, bound)
            } else open = false
          }
        }
        accepted.result().foreach { case (l, r, cnt) =>
          merges += Merge(rank, l, r, cnt)
          working = applyMerge(working, l, r)
          rank += 1
        }
        working = working.filter(size(col("syms")) >= 2).localCheckpoint()
      }
    }
    (merges.result(), rounds)
  }

  /** Applies a trained merge list to segment words — the tokenizer's
    * ENCODE side: each merge is one greedy left-to-right pass, applied in
    * rank order (the standard BPE inference rule). Adds `syms:
    * array<string>` to a df with a `word` column. At corpus scale, encode
    * the distinct-word VOCABULARY and join segments back to the corpus —
    * the same corpus→vocabulary collapse as training.
    */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(
      words.withColumn("syms", split(col("word"), "(?!^)(?=.)")))(
      (df, m) => applyMerge(df, m.left, m.right))

  /** The trained merge list as a DataFrame (rank, lhs, rhs,
    * n_occurrences) — the query-surface form (`lhs`/`rhs`, not
    * `left`/`right`: those are function names in the oracle dialect).
    */
  def trainDf(wordFreq: DataFrame, numMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    train(wordFreq, numMerges).toDF("rank", "lhs", "rhs", "n_occurrences")
  }
}
