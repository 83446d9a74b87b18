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

  /** Trains `numMerges` merges over a (word, freq) table. Stops early when
    * no adjacent pair remains.
    */
  def train(wordFreq: DataFrame, numMerges: Int): Seq[Merge] = {
    var working = toSymbols(wordFreq)
      .filter(size(col("syms")) >= 2)
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = adjacentPairCounts(working)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        working = applyMerge(working, l, r)
          .filter(size(col("syms")) >= 2)
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result()
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
