package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training for the hashed-feature linear quality classifier —
  * the TRAIN side of the fastText-shaped scorer whose inference the engine
  * already runs (`text_hash_classifier`): logistic regression by full-batch
  * gradient descent over hashed bag-of-tokens features.
  *
  * Feature space: token → MD5-derived bucket in [0, dim) using the exact
  * integer recipe the inference kernel and its DuckDB oracle already share
  * (`ascii(hex)` arithmetic — cross-engine parity is proven by the
  * `text_hash_classifier` hash-match), value = token count normalized by
  * document length (mean-of-features, as fastText does).
  *
  * Scale shape, per iteration:
  *   - the model (dim + 1 doubles) rides as a broadcast (b, w) relation
  *     joined to the feature rows — nothing is collected per row, and
  *     because the plan TEXT never changes across iterations, whole-stage
  *     codegen compiles once for the whole loop (an array-literal model
  *     would force a fresh janino compile every iteration); inference
  *     ([[predict]]) runs once, so it keeps the literal-array form;
  *   - one hash-aggregate per doc for margins (feature rows are built once
  *     and persisted — the explode/shuffle is paid once, not per
  *     iteration);
  *   - one hash-aggregate per bucket for the gradient — the bias gradient
  *     rides in the same aggregate as synthetic bucket −1, so each
  *     iteration is ONE driver-synchronized job — collected at `dim` + 1
  *     rows: parameter-bounded, the same class as the
  *     [[graft.similarity.Pq]] codebook and [[NgramLM]] model collects.
  * Iterations are a bounded constant; at 100 TB the cost is
  * O(iterations · one pass over cached feature rows), the canonical
  * distributed-LR profile (mini-batching swaps in by sampling the cached
  * features without changing the loop).
  *
  * Decision determinism: gradient sums are floating-point and
  * partition-order dependent at the ulp level, so WEIGHTS are only
  * reproducible to ~1e-15 — but on a separable corpus the DECISION margins
  * are O(1), which is what the planted-truth oracle asserts
  * (`text_lr_train_xcheck`), the same robustness argument as the k-means
  * paths ([[graft.similarity.SemDeDup]]).
  */
object HashedLr {

  final case class Model(weights: Array[Double], bias: Double, dim: Int)

  /** Same bucket arithmetic as the native kernel's oracle — two hex chars
    * of md5(token), mod dim.
    */
  def bucketExpr(tokCol: String, dim: Int): String =
    s"(ascii(substr(md5($tokCol), 1, 1)) * 256 + " +
      s"ascii(substr(md5($tokCol), 2, 1))) % $dim"

  /** (docId, bucket, x, y) feature rows: x = count/len — plus the bias
    * feature as bucket −1 with x = 1, injected as a NULL sentinel into
    * the exploded tokens (round 19: the previous
    * `unionByName(feats.distinct())` bias branch re-ran the whole
    * explode+aggregate a second time and paid a union + distinct
    * exchange; one sentinel row per doc gets the same (did, y, −1, 1.0)
    * rows in the single pass). A real token can never collide with the
    * sentinel: [[bucketExpr]] is a modulus of ascii codes, always ≥ 0.
    */
  private def featureRows(docs: DataFrame, docId: String, text: String,
      label: String, dim: Int): DataFrame = {
    docs
      .selectExpr(s"$docId AS did", s"${TextOps.tokensExpr(text)} AS toks",
        s"CAST(CAST($label AS INT) AS DOUBLE) AS y")
      .where("SIZE(toks) >= 1")
      .select(col("did"), col("y"),
        size(col("toks")).cast("double").as("len"),
        explode(concat(array(lit(null).cast("string")), col("toks"))).as("tok"))
      .selectExpr("did", "y", "len",
        s"CASE WHEN tok IS NULL THEN -1 ELSE ${bucketExpr("tok", dim)} END AS b")
      .groupBy("did", "y", "b")
      .agg(when(col("b") === -1, lit(1.0))
        .otherwise(count(lit(1)) / first("len")).as("x"))
  }

  /** Precondition: `docId` uniquely identifies a row (so each doc carries
    * exactly one label). The per-iteration `groupBy(did) + first(y)`
    * relies on y being functionally dependent on did — a docId appearing
    * with conflicting labels would train on an arbitrary one of them.
    * Every caller feeds table rows keyed by docId, where this holds.
    */
  def train(docs: DataFrame, docId: String, text: String, label: String,
      dim: Int = 32, iterations: Int = 15, learningRate: Double = 1.0): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The bias rides as synthetic bucket −1 with x = 1 in the SAME rows
    // as the hashed features: margins pick it up through the weight join
    // (w(−1) = bias) and the gradient aggregate emits ∂L/∂bias at b = −1
    // — one driver-synchronized job per iteration, collecting dim + 1
    // rows. The model enters each iteration as a broadcast-joined
    // (b, w) DataFrame, NOT a literal array: iteration plans are then
    // textually identical, so whole-stage codegen compiles once and every
    // later iteration is a cache hit instead of a fresh janino compile.
    // Cached PRE-PARTITIONED by did (round 19): the per-iteration margins
    // aggregate and the gradient join are both keyed on did, so a
    // did-partitioned cache satisfies their distribution and each
    // iteration pays only the tiny dim-sized gradient exchange — the
    // previous unpartitioned cache re-shuffled the feature rows by did
    // every iteration (guide §2.4: two operations keyed the same way
    // share one exchange).
    val feats = featureRows(docs, docId, text, label, dim)
      .repartition(col("did"))
      .persist()
    try {
      val nDocs = feats.filter(col("b") === -1).count().toDouble
      require(nDocs > 0, "training corpus has no tokenizable documents")
      val w = Array.fill(dim)(0.0)
      var bias = 0.0
      for (_ <- 0 until iterations) {
        val wDf = ((-1, bias) +: w.toIndexedSeq.zipWithIndex
          .map { case (v, i) => (i, v) }).toDF("b", "w")
        // resid has exactly ONE consumer (the gradient join), so it stays
        // lazy inside the single per-iteration job — no persist round.
        // Grouped by did alone (y is functionally dependent on did —
        // first(y) is deterministic here) so the grouping matches the
        // cache partitioning exactly.
        val resid = feats
          .join(broadcast(wDf), "b")
          .groupBy("did")
          .agg(sum(col("x") * col("w")).as("m"), first(col("y")).as("y0"))
          .select(col("did"),
            (col("y0") - lit(1.0) / (lit(1.0) + exp(-col("m")))).as("r"))
        val grad = feats.join(resid, "did")
          .groupBy("b")
          .agg(sum(col("x") * col("r")).as("g"))
          .collect()
        grad.foreach { row =>
          val b = row.getAs[Number]("b").intValue()
          val step = learningRate * row.getAs[Double]("g") / nDocs
          if (b == -1) bias += step else w(b) += step
        }
      }
      Model(w, bias, dim)
    } finally { feats.unpersist() }
  }

  private def wArr(w: Array[Double]): Column =
    array(w.toIndexedSeq.map(lit): _*)

  /** One narrow pass + one per-doc aggregate: margin and decision for every
    * tokenizable document.
    */
  def predict(docs: DataFrame, docId: String, text: String, model: Model): DataFrame =
    docs
      .selectExpr(s"$docId AS did", s"${TextOps.tokensExpr(text)} AS toks")
      .where("SIZE(toks) >= 1")
      .select(col("did"),
        size(col("toks")).cast("double").as("len"), explode(col("toks")).as("tok"))
      .selectExpr("did", "len", s"${bucketExpr("tok", model.dim)} AS b")
      .groupBy("did", "len", "b").agg(count(lit(1)).as("cnt"))
      .groupBy("did")
      .agg((sum(col("cnt") / col("len") * element_at(wArr(model.weights), col("b") + 1))
        + lit(model.bias)).as("margin"))
      .select(col("did"), col("margin"), (col("margin") >= 0).as("predicted"))
}
