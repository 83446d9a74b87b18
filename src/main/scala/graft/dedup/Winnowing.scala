package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's rolling-hash
  * scheme, public algorithm): hash every character k-gram, then keep the
  * minimum hash of each w-window of consecutive k-gram hashes. Guarantees
  * any shared substring of length ≥ w+k−1 contributes a shared fingerprint,
  * so near-identical documents share most fingerprints.
  *
  * Implementation note (hard-won): the window-min pass must NOT be an
  * array lambda referencing the hash array — Spark evaluates higher-order
  * lambdas interpreted, and CollapseProject does not count references made
  * from inside a lambda, so the hash array gets inlined and recomputed once
  * per window: O(n²·k) per document (measured 600+ s over 5k docs). The
  * scalable shape is rows: posexplode the k-gram hashes and take a sliding
  * `min().over(rowsBetween(0, w-1))` window — whole-stage codegen, one
  * shuffle on doc_id, linear work.
  */
object Winnowing {

  /** Distinct winnowing fingerprint set of a text column — the native
    * [[graft.functions.WinnowFingerprints]] expression: one O(n) deque
    * pass per document (hash k-grams, sliding window min, dedupe), fused
    * where the declarative shape needed an interpreted hash lambda plus a
    * posexplode → per-doc window sort → distinct chain of shuffles.
    */
  /** (doc_id, fp) inverted index — the candidate-retrieval shape at scale
    * (join on fingerprint instead of comparing document pairs).
    */
  def fingerprintIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
      explode(call_function("graft_winnow_fps", col(textCol), lit(k), lit(w))).as("fp"))
  }

  /** Adds `outCol` = the distinct fingerprint set per row of `docs` (array
    * form, for set-similarity math); built on [[fingerprintIndex]].
    */
  def withFingerprints(docs: DataFrame, idCol: String, textCol: String,
      outCol: String = "fp", k: Int = 5, w: Int = 4): DataFrame = {
    val fps = fingerprintIndex(docs, idCol, textCol, k, w)
      .groupBy(col("doc_id")).agg(collect_set(col("fp")).as(outCol))
    docs.join(fps, docs(idCol) === fps("doc_id"), "left").drop(fps("doc_id"))
  }

  /** Near-dup candidate pairs sharing ≥ minShared fingerprints. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      minShared: Int = 3, k: Int = 5, w: Int = 4): DataFrame = {
    val idx = fingerprintIndex(docs, idCol, textCol, k, w)
    val a = idx.select(col("doc_id").as("id_a"), col("fp"))
    val b = idx.select(col("doc_id").as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
