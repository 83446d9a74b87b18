package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column —
  * the 100 TB shape: shingle → minhash signature (narrow map, xxhash64,
  * codegen'd) → band buckets (explode ×bands) → equi-join on bucket key →
  * exact Jaccard only on bucket-mates. Never an all-pairs cross join.
  *
  * Reference has no dedup machinery (documents table is a north-star
  * extension, BASELINE.json); the oracle-checked MD5 variant of the same
  * pipeline is `graft.queries.TextQueries.dedup_minhash_md5`.
  */
object MinHash {

  /** Whitespace tokens → `n`-gram shingle array (distinct). Pure
    * higher-order expressions; assumes `size(tokens) >= n` rows are
    * pre-filtered (see [[shingleFilter]]).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = regexp_extract_all(text, lit("\\S+"), lit(0))
    array_distinct(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  def shingleFilter(text: Column, n: Int = 3): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))) >= n

  /** MinHash signature: element k = min over shingles of
    * xxhash64(k, shingle). One long per hash — 8·numHashes bytes per doc
    * shuffled, independent of document size.
    */
  def signature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { k =>
      array_min(transform(shingleCol, s => xxhash64(lit(k), s)))
    }: _*)

  /** (band_idx, band_hash) bucket keys: hash of each signature slice. */
  def bandKeys(sigCol: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(slice(sigCol, b * rows + 1, rows)).as("band_hash"))
    }: _*)
  }

  /** Candidate near-dup pairs (idA < idB) sharing ≥1 band bucket. */
  def candidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val withSig = docs
      .filter(shingleFilter(col(textCol), shingleSize))
      .select(col(idCol).as("doc_id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", signature(col("sh"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), numHashes, bands)))
      .select(col("doc_id"), col("sh"), col("band.band_idx"), col("band.band_hash"))
    val a = withSig.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
      col("band_idx"), col("band_hash"))
    val b = withSig.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact shingle-set Jaccard, computed only for LSH candidates. */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b")))
    candidatePairs(docs, idCol, textCol, numHashes, bands, shingleSize)
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** N-gram Jaccard similarity for given pairs (exact, no LSH) — the
    * brute-force counterpart used by small-scope queries and tests.
    */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") / size(array_union(shA, shB))
}
