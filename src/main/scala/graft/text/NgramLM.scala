package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-bigram language model for statistical quality scoring of
  * training text (the classic cheap perplexity filter: documents whose
  * character statistics diverge from the corpus score high and get
  * dropped/down-weighted).
  *
  * Fully distributed: training is one explode + two aggregations over
  * per-doc bigram counts emitted by a native expression; scoring is a
  * shuffle-free map pass with the (|charset|²-bounded) model shipped inside
  * the scoring expression.
  */
object NgramLM {

  private def normalized(textCol: String) =
    s"lower(regexp_replace($textCol, '\\\\s+', ' '))"

  /** Per-text bigram counts via the native [[graft.functions.BigramCounts]]
    * expression — one JVM pass per document (the interpreted
    * `transform(sequence(...))` lambda costs a boxed substring per char).
    * Registered on the frame's own session (idempotent).
    */
  private def bigramCounts(docs: DataFrame, textExpr: String): org.apache.spark.sql.Column = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    call_function("graft_bigram_counts", expr(textExpr))
  }

  /** Corpus bigram→logP with add-one smoothing over the observed charset:
    * log_p = ln((c(ab)+1) / (c(a·)+V)). ONE distributed aggregation
    * (explode of per-doc counts, map-side combined); the reduced counts are
    * |charset|²-bounded regardless of corpus size, so the smoothing math
    * runs on the driver — no second shuffle, no separate vocab action.
    */
  private def trainMap(docs: DataFrame, textCol: String): Map[String, Double] = {
    val counts: Array[(String, Long)] = docs
      .select(explode(bigramCounts(docs, normalized(textCol))).as("bc"))
      .groupBy(col("bc.bigram").as("bigram")).agg(sum(col("bc.n")).as("c_ab"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def headChar(s: String) = s.substring(0, Character.charCount(s.codePointAt(0)))
    val prefixTotals = counts.groupBy(c => headChar(c._1))
      .view.mapValues(_.map(_._2).sum).toMap
    val vocab = counts.iterator.flatMap { case (b, _) =>
      val h = headChar(b); Iterator(h, b.substring(h.length))
    }.toSet.size
    counts.iterator.map { case (b, cAb) =>
      b -> math.log((cAb + 1).toDouble / (prefixTotals(headChar(b)) + vocab))
    }.toMap
  }

  /** Train: (bigram, log_p) rows of [[trainMap]] (DataFrame API surface). */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMap(docs, textCol).toSeq.toDF("bigram", "log_p")
  }

  /** Score each document: mean negative log-probability of its bigrams
    * (lower = more corpus-typical). Unseen bigrams take a fixed floor.
    *
    * The model is |charset|²-bounded — collected once and shipped inside a
    * native [[graft.functions.BigramNll]] expression (same data movement as
    * a broadcast, minus the join and per-doc aggregation shuffle): scoring
    * is one narrow map pass, no shuffle at all.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, unseenLogP: Double = -12.0): DataFrame =
    scoreWithMap(docs, idCol, textCol,
      model.select(col("bigram"), col("log_p")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap,
      unseenLogP)

  private def scoreWithMap(docs: DataFrame, idCol: String, textCol: String,
      modelMap: Map[String, Double], unseenLogP: Double): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col(idCol),
        GraftColumnBridge.column(graft.functions.BigramNll(
          GraftColumnBridge.expression(bigramCounts(docs, normalized(textCol))),
          modelMap, unseenLogP)).as("__sc"))
      .select(col(idCol), col("__sc.nll").as("nll"),
        col("__sc.n_bigrams").as("n_bigrams"))
      .filter(col("n_bigrams") > 0) // docs shorter than one bigram: no score
  }

  /** Train on the corpus and score every document against it — two Spark
    * jobs total (corpus aggregation, scoring map pass).
    */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWithMap(docs, idCol, textCol, trainMap(docs, textCol), -12.0)
}
