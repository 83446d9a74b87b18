package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's rolling-hash
  * scheme, public algorithm): hash every character k-gram, then keep the
  * minimum hash of each w-window of consecutive k-gram hashes. Guarantees
  * any shared substring of length ≥ w+k−1 contributes a shared fingerprint,
  * so near-identical documents share most fingerprints.
  *
  * Pure Column expressions (substring windows + xxhash64 + slice/array_min)
  * — a narrow map per document; fingerprints are ~|text|/w longs, so the
  * shuffled footprint is a fraction of the document.
  */
object Winnowing {

  /** Distinct window-minimum fingerprints of `text`. */
  def fingerprints(text: Column, k: Int = 5, w: Int = 4): Column = {
    val hashes = transform(sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(k))))
    array_distinct(transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => array_min(slice(hashes, i, lit(w)))))
  }

  /** (id, fingerprint) table — the inverted-index shape used for candidate
    * retrieval at scale (join on fingerprint instead of comparing pairs).
    */
  def fingerprintIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(fingerprints(col(textCol), k, w)).as("fp"))

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
