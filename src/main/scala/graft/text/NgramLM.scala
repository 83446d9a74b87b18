package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Character-bigram language model for statistical quality scoring of
  * training text (the classic cheap perplexity filter: documents whose
  * character statistics diverge from the corpus score high and get
  * dropped/down-weighted).
  *
  * Fully distributed: training is one explode + two aggregations; scoring
  * is an explode + broadcast join + per-doc average. The model itself is a
  * small DataFrame (|charset|² rows max) — broadcastable at any corpus
  * scale.
  */
object NgramLM {

  /** Bigram array of a (lowercased, whitespace-normalized) text column —
    * cheap attribute refs only inside the lambda (no recompute hazard).
    */
  private def bigrams(textCol: String) =
    expr(s"transform(sequence(1, greatest(length($textCol) - 1, 1)), " +
      s"i -> substring($textCol, i, 2))")

  private def normalized(textCol: String) =
    s"lower(regexp_replace($textCol, '\\\\s+', ' '))"

  /** Train: (bigram, log_p) with add-one smoothing over the observed
    * charset. log_p = ln((c(ab)+1) / (c(a·)+V)).
    */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val big = docs
      .selectExpr(s"${normalized(textCol)} AS __t")
      .select(explode(bigrams("__t")).as("bigram"))
      .filter(length(col("bigram")) === 2)
    val counts = big.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .withColumn("prefix", substring(col("bigram"), 1, 1))
    val prefixTotals = counts.groupBy("prefix").agg(sum("c_ab").as("c_a"))
    val vocab = counts.select(substring(col("bigram"), 2, 1).as("ch"))
      .union(counts.select(col("prefix").as("ch")))
      .distinct().count()
    counts.join(prefixTotals, "prefix")
      .select(col("bigram"),
        log((col("c_ab") + 1).cast("double") / (col("c_a") + vocab)).as("log_p"))
  }

  /** Per-doc bigram counts — the shared intermediate: one tokenize pass
    * feeds both training and scoring, and the model join sees one row per
    * (doc, bigram) instead of one per bigram instance.
    */
  private def docBigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.selectExpr(idCol, s"${normalized(textCol)} AS __t")
      .select(col(idCol), explode(bigrams("__t")).as("bigram"))
      .filter(length(col("bigram")) === 2)
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("n"))

  /** Score each document: mean negative log-probability of its bigrams
    * (lower = more corpus-typical). Unseen bigrams take a fixed floor.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, unseenLogP: Double = -12.0): DataFrame =
    scoreCounts(docBigramCounts(docs, idCol, textCol), idCol, model, unseenLogP)

  private def scoreCounts(docBi: DataFrame, idCol: String, model: DataFrame,
      unseenLogP: Double): DataFrame =
    docBi.join(broadcast(model), Seq("bigram"), "left")
      .withColumn("log_p", coalesce(col("log_p"), lit(unseenLogP)))
      .groupBy(col(idCol))
      .agg((-(sum(col("n") * col("log_p")) / sum(col("n")))).as("nll"),
        sum(col("n")).as("n_bigrams"))

  /** Train on the corpus and score every document against it — one
    * tokenize pass serves both.
    */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docBi = docBigramCounts(docs, idCol, textCol).cache()
    try {
      val counts = docBi.groupBy("bigram").agg(sum("n").as("c_ab"))
        .withColumn("prefix", substring(col("bigram"), 1, 1))
      val prefixTotals = counts.groupBy("prefix").agg(sum("c_ab").as("c_a"))
      val vocab = counts.select(substring(col("bigram"), 2, 1).as("ch"))
        .union(counts.select(col("prefix").as("ch")))
        .distinct().count()
      val model = counts.join(prefixTotals, "prefix")
        .select(col("bigram"),
          log((col("c_ab") + 1).cast("double") / (col("c_a") + vocab)).as("log_p"))
      // materialize before dropping the shared cache (callers re-consume)
      scoreCounts(docBi, idCol, model, -12.0).localCheckpoint()
    } finally docBi.unpersist()
  }
}
