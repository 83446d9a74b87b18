package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate fingerprinting.
  *
  * Spark-first: the signature is a narrow-map Column expression —
  * `aggregate` over per-token xxhash64 values with a 64-slot vote
  * accumulator (`zip_with` add), then sign → bit, assembled into one
  * long. No explode, no shuffle, no UDF; at 100 TB this is
  * embarrassingly parallel over document rows, and the shuffled
  * fingerprint is 8 bytes per doc.
  *
  * Near-dup candidates come from banding the 64-bit fingerprint into
  * 16-bit buckets (docs differing in ≤3 bits are guaranteed to share at
  * least one of 4 bands) — an equi-join on bucket keys, not all-pairs.
  */
object SimHash {

  private val Bits = 64

  /** ±1 votes for every bit of a (lambda-bound) token hash. */
  private def votes(h: Column): Column =
    array((0 until Bits).map { i =>
      when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1))
    }: _*)

  /** Vote accumulator: array<int>[64] of signed bit votes over tokens. */
  private def voteAccumulator(text: Column): Column = {
    val hashes = transform(
      regexp_extract_all(text, lit("\\S+"), lit(0)), t => xxhash64(t))
    aggregate(hashes, array_repeat(lit(0), Bits),
      (a, h) => zip_with(a, votes(h), (x, y) => x + y))
  }

  /** Adds `outCol` = 64-bit SimHash of `textCol`, via the native
    * [[graft.functions.SimHash64]] expression (one JVM pass per row; the
    * declarative accumulator below pays interpreted zip_with per token and
    * is kept as the semantic reference for the parity spec).
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String = "sim"): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.withColumn(outCol, call_function("graft_simhash64", col(textCol)))
  }

  /** The declarative formulation (semantic reference; used by the parity
    * spec to pin the native expression's bit-exactness).
    */
  def withSimhashDeclarative(df: DataFrame, textCol: String,
      outCol: String = "sim"): DataFrame = {
    val tmp = "__graft_simbits"
    val assembled = (0 until Bits).map { i =>
      when(element_at(col(tmp), i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn(tmp, voteAccumulator(col(textCol)))
      .withColumn(outCol, assembled)
      .drop(tmp)
  }

  /** Hamming distance between two fingerprints (codegen'd bit_count). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (band_idx, band_val) keys from 4×16-bit bands of the fingerprint. */
  def bandKeys(sim: Column, bands: Int = 4): Column = {
    val bits = Bits / bands
    val mask = (1L << bits) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        shiftright(sim, b * bits).bitwiseAND(lit(mask)).as("band_val"))
    }: _*)
  }

  /** Near-dup pairs (idA < idB) with Hamming distance ≤ maxHamming,
    * candidates restricted to band-bucket mates.
    */
  def nearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val sigs = withSimhash(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")), "__text")
      .withColumn("band", explode(bandKeys(col("sim"), bands)))
      .select(col("doc_id"), col("sim"), col("band.band_idx"), col("band.band_val"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sim").as("sim_a"),
      col("band_idx"), col("band_val"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sim").as("sim_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
