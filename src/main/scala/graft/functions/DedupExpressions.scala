package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass twins of the declarative MinHash/SimHash pipelines in
  * [[graft.dedup]] — bit-identical outputs (same xxhash64 seed chaining as
  * the SQL `xxhash64` expression), minus the interpreted-lambda tax: the
  * declarative forms re-evaluate the tokenizer inside every lambda element
  * (CollapseProject inlines through lambdas), and a 16-hash signature
  * references the shingle array 16 times.
  */
private[functions] object DedupEval {
  private val tokenPattern = java.util.regex.Pattern.compile("\\S+")

  def tokens(text: UTF8String): Array[String] = {
    val m = tokenPattern.matcher(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** xxhash64 of a string with the given seed — SQL `xxhash64` parity. */
  def hashString(s: String, seed: Long): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }
}

/** `graft_shingles(text, n)` → array<string> — distinct whitespace-token
  * n-gram shingles in first-occurrence order, matching
  * `array_distinct(transform(sequence(0, size(toks)-n), i ->
  * concat_ws(' ', toks[i..i+n-1])))` exactly. Empty array when fewer than
  * n tokens.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "graft_shingles"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = DedupEval.tokens(input.asInstanceOf[UTF8String])
    val nSh = toks.length - n + 1
    if (nSh < 1) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < nSh) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** `graft_xx_minhash_bands(text, numHashes, bands, shingleSize)` →
  * array<struct<band_idx:int, band_hash:bigint>> — banded LSH bucket keys
  * of the xxhash64 MinHash signature over token shingles. Matches
  * `MinHash.signature` + `MinHash.bandKeys` exactly: sig[k] = min over
  * shingles of `xxhash64(k, shingle)` (int k then string, seed-chained
  * from 42); band_hash = `xxhash64(slice(sig, b*rows+1, rows))`
  * (sequential long chaining). Null when no shingle exists.
  */
case class XxMinHashBands(child: Expression, numHashes: Int, bands: Int,
    shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    "numHashes must be a positive multiple of bands")
  require(shingleSize >= 1, "shingleSize must be >= 1")

  override def prettyName: String = "graft_xx_minhash_bands"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band_idx", IntegerType, nullable = false),
      StructField("band_hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = DedupEval.tokens(input.asInstanceOf[UTF8String])
    val nSh = toks.length - shingleSize + 1
    if (nSh < 1) return null
    val shingles = new Array[String](nSh)
    var i = 0
    while (i < nSh) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < shingleSize) { sb.append(' ').append(toks(i + j)); j += 1 }
      shingles(i) = sb.toString
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      // xxhash64(k, shingle): int k hashed with seed 42, result seeds the
      // string hash (SQL multi-arg xxhash64 chaining)
      val kSeed = XXH64.hashInt(k, 42L)
      var best = Long.MaxValue
      i = 0
      while (i < nSh) {
        val h = DedupEval.hashString(shingles(i), kSeed)
        if (h < best) best = h
        i += 1
      }
      sig(k) = best
      k += 1
    }
    val rows = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var j = 0
      while (j < rows) { h = XXH64.hashLong(sig(b * rows + j), h); j += 1 }
      out(b) = InternalRow(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): XxMinHashBands =
    copy(child = newChild)
}

/** `graft_simhash64(text)` → bigint — 64-bit SimHash over whitespace
  * tokens, matching [[graft.dedup.SimHash.withSimhash]] exactly: per-token
  * `xxhash64(token)` (seed 42), ±1 vote per bit, bit set iff votes > 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_simhash64"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val toks = DedupEval.tokens(input.asInstanceOf[UTF8String])
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = DedupEval.hashString(toks(t), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sim |= (1L << i); i += 1 }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
