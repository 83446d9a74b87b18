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

  /** Corpus (bigram, c_ab) counts: ONE distributed aggregation over
    * per-doc counts (map-side combined); |charset|²-bounded output.
    */
  private def corpusCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(bigramCounts(docs, normalized(textCol))).as("bc"))
      .groupBy(col("bc.bigram").as("bigram")).agg(sum(col("bc.n")).as("c_ab"))

  /** Driver-side add-one smoothing over collected counts:
    * log_p = ln((c(ab)+1) / (c(a·)+V)).
    */
  private def smooth(counts: Array[(String, Long)]): Map[String, Double] = {
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

  /** Distributed smoothing — same math as [[smooth]] without collecting
    * (the fallback when the observed charset is huge).
    */
  private def trainModelFrom(counts: DataFrame): DataFrame = {
    val withPrefix = counts.withColumn("prefix", substring(col("bigram"), 1, 1))
    val prefixTotals = withPrefix.groupBy("prefix").agg(sum("c_ab").as("c_a"))
    val vocab = withPrefix.select(substring(col("bigram"), 2, 1).as("ch"))
      .union(withPrefix.select(col("prefix").as("ch")))
      .distinct().count()
    withPrefix.join(prefixTotals, "prefix")
      .select(col("bigram"),
        log((col("c_ab") + 1).cast("double") / (col("c_a") + vocab)).as("log_p"))
  }

  /** Train: (bigram, log_p) rows (DataFrame API surface). */
  def train(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = corpusCounts(docs, textCol)
    val taken = counts.take(MaxDriverModelSize + 1)
    if (taken.length > MaxDriverModelSize) trainModelFrom(counts)
    else smooth(taken.map(r => r.getString(0) -> r.getLong(1)))
      .toSeq.toDF("bigram", "log_p")
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

  /** Largest model the driver-collected fast path accepts. ASCII-ish
    * corpora sit far below it (|charset|² bigrams); a CJK/multilingual
    * corpus can blow past it, so scoring falls back to the distributed
    * broadcast-join path instead of OOMing the driver.
    */
  val MaxDriverModelSize = 500000

  /** Distributed fallback scorer: per-doc bigram counts joined against the
    * model frame (broadcast) + per-doc aggregation. Same result as the
    * expression path; one extra shuffle.
    */
  private def scoreViaJoin(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, unseenLogP: Double): DataFrame =
    docs.select(col(idCol),
        explode(bigramCounts(docs, normalized(textCol))).as("bc"))
      .select(col(idCol), col("bc.bigram").as("bigram"), col("bc.n").as("n"))
      .join(broadcast(model), Seq("bigram"), "left")
      .withColumn("log_p", coalesce(col("log_p"), lit(unseenLogP)))
      .groupBy(col(idCol))
      .agg((-(sum(col("n") * col("log_p")) / sum(col("n")))).as("nll"),
        sum(col("n")).as("n_bigrams"))

  /** Train on the corpus and score every document against it — two Spark
    * jobs total (corpus aggregation, scoring map pass) on the fast path;
    * oversized models (huge charsets) score via the distributed join.
    */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = corpusCounts(docs, textCol)
    // take(max+1): one action; when the model fits, the taken rows ARE the
    // whole model — no second aggregation run
    val taken = counts.take(MaxDriverModelSize + 1)
    if (taken.length > MaxDriverModelSize)
      scoreViaJoin(docs, idCol, textCol, trainModelFrom(counts), -12.0)
    else
      scoreWithMap(docs, idCol, textCol,
        smooth(taken.map(r => r.getString(0) -> r.getLong(1))), -12.0)
  }
}
