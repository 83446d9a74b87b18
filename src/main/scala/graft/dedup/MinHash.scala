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

  /** Candidate near-dup pairs (idA < idB) sharing ≥1 band bucket. Band
    * keys come from the native [[graft.functions.XxMinHashBands]] (bit-
    * identical to [[signature]]+[[bandKeys]], parity-spec'd). The bucket
    * join carries only (doc_id, band) — shingle arrays are fetched AFTER
    * pair dedup (they'd otherwise be recomputed per band × join side and
    * shuffled with every bucket row).
    */
  def candidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 3): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val eligible = docs.filter(shingleFilter(col(textCol), shingleSize))
    val bandRows = eligible
      .select(col(idCol).as("doc_id"),
        explode(call_function("graft_xx_minhash_bands", col(textCol),
          lit(numHashes), lit(bands), lit(shingleSize))).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    val pairs = bandRows.select(col("doc_id").as("id_a"), col("band_idx"), col("band_hash"))
      .join(bandRows.select(col("doc_id").as("id_b"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val sh = eligible.select(col(idCol).as("doc_id"),
      call_function("graft_shingles", col(textCol), lit(shingleSize)).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
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
