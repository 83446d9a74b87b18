package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text hot paths (LM scoring,
  * winnowing). The declarative formulations (`transform(sequence(...))` +
  * `explode` + window) are semantically right but Spark evaluates
  * higher-order lambdas interpreted — one boxed substring/hash call per
  * character — and the winnowing window-min needs a per-doc shuffle+sort.
  * Each expression below does the same work as ONE tight JVM pass per row,
  * emitting the already-reduced per-document result (bigram counts /
  * fingerprint set), so both the lambda overhead and the intermediate
  * explode→aggregate shuffle disappear.
  *
  * Eval-only (CodegenFallback): the per-row work dominates; these are
  * leaf-heavy calls, not per-element expression trees.
  */
object TextExpressions {

  /** Byte offset of each codepoint boundary (UTF-8 lead-byte widths), with
    * a final sentinel = numBytes. Lets k-gram/bigram slices address raw
    * byte ranges without quadratic re-scans.
    */
  private[functions] def charOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      offs(n) = i
      val b = bytes(i) & 0xFF
      i += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      n += 1
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }
}

/** `graft_bigram_counts(text)` → array<struct<bigram:string, n:bigint>> —
  * distinct character bigrams of `text` with their occurrence counts, in
  * first-appearance order. Equivalent to exploding all consecutive
  * 2-char substrings and counting per value, fused into one pass.
  */
case class BigramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_bigram_counts"
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bigram", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val offs = TextExpressions.charOffsets(bytes)
    val nChars = offs.length - 1
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < nChars - 1) {
      // bigram = chars [i, i+2): bytes [offs(i), offs(i+2))
      val key = UTF8String.fromBytes(bytes, offs(i), offs(i + 2) - offs(i))
      val slot = counts.get(key)
      if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val rows = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      rows(j) = InternalRow(e.getKey, e.getValue()(0))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

/** `graft_md5_minhash(text, nHashes)` → array<string> — MD5-keyed MinHash
  * signature over whitespace-token 3-gram shingles, bit-identical to the
  * declarative form (and its DuckDB oracle):
  * `ARRAY_MIN(TRANSFORM(shingles, sh -> MD5(CONCAT('k:', sh))))` per k,
  * tokens = `regexp_extract_all(text, '\S+')`, shingles joined with ' '.
  * One pass per row: the nested-lambda form re-evaluates the tokenizer
  * regex inside every lambda element (CollapseProject inlines through
  * lambdas), turning an O(shingles) job into O(shingles × tokens).
  * Null when the text has fewer than 3 tokens (no shingle exists).
  */
case class Md5MinHash(child: Expression, nHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(nHashes >= 1, "nHashes must be >= 1")

  override def prettyName: String = "graft_md5_minhash"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  @transient private lazy val tokenPattern = java.util.regex.Pattern.compile("\\S+")
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xF)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = tokenPattern.matcher(text)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) tokens += m.group()
    val nSh = tokens.length - 2
    if (nSh < 1) return null
    val shingleBytes = new Array[Array[Byte]](nSh)
    var i = 0
    while (i < nSh) {
      shingleBytes(i) = (tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val mins = new Array[Any](nHashes)
    var k = 0
    while (k < nHashes) {
      val prefix = s"$k:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var best: String = null
      i = 0
      while (i < nSh) {
        md5.reset()
        md5.update(prefix)
        md5.update(shingleBytes(i))
        val h = hex(md5.digest())
        if (best == null || h.compareTo(best) < 0) best = h
        i += 1
      }
      mins(k) = UTF8String.fromString(best)
      k += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHash =
    copy(child = newChild)
}

/** `graft_md5_bucket_score(text)` → struct<n_tokens:int, raw_score:bigint>
  * — the hashed-linear-classifier kernel: each whitespace token's weight is
  * `(ascii(md5hex[0])·256 + ascii(md5hex[1])) % 61 − 30`, summed over the
  * document. Bit-identical to the declarative
  * `AGGREGATE(TRANSFORM(tokens, t -> ...MD5(t)...), 0L, +)` form (and its
  * DuckDB `list_sum(list_transform(...))` twin), fused into one pass with
  * ONE digest per token — the lambda form re-runs MD5 once per SUBSTRING
  * reference and evaluates interpreted. Null when the text has no tokens
  * (no mean exists).
  */
case class Md5BucketScore(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_md5_bucket_score"
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("raw_score", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  @transient private lazy val tokenPattern = java.util.regex.Pattern.compile("\\S+")
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = tokenPattern.matcher(text)
    var n = 0
    var score = 0L
    while (m.find()) {
      md5.reset()
      val d = md5.digest(
        m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first two hex chars of the digest, as the declarative form sees them
      val c0 = hexChars((d(0) & 0xFF) >>> 4)
      val c1 = hexChars(d(0) & 0xF)
      score += (c0.toInt * 256 + c1.toInt) % 61 - 30
      n += 1
    }
    if (n == 0) null else InternalRow(n, score)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BucketScore =
    copy(child = newChild)
}

/** `BigramNll(bigramCounts, model, unseenLogP)` →
  * struct<nll:double, n_bigrams:bigint> — mean negative log-probability of a
  * document's bigrams under a (small, driver-collected) bigram→logP model.
  * The model is |charset|²-bounded, so shipping it inside the expression is
  * the same cost class as a broadcast join, without the join or the per-doc
  * aggregation shuffle. Accumulates in array (first-appearance) order —
  * deterministic across runs.
  */
case class BigramNll(child: Expression, model: Map[String, Double],
    unseenLogP: Double)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_bigram_nll"
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("nll", DoubleType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](model.size * 2)
    model.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, StringType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<string,bigint>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var num = 0.0
    var den = 0L
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val row = arr.getStruct(i, 2)
      val n = row.getLong(1)
      val lp = lookup.get(row.getUTF8String(0))
      num += n * (if (lp == null) unseenLogP else lp.doubleValue())
      den += n
      i += 1
    }
    InternalRow(if (den == 0) 0.0 else -(num / den), den)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramNll =
    copy(child = newChild)
}

/** `graft_token_grams(text, k)` → array<string> — the DISTINCT MD5 hashes
  * of `text`'s k-token grams (whitespace tokens joined with ' '),
  * bit-identical to the declarative posexplode + lead-window + md5 chain
  * (and its DuckDB `list_transform(range(...), i -> md5(array_to_string(
  * toks[i:i+k-1], ' ')))` twin), fused into one pass per document: no
  * explode, no per-doc sort, no window exec — the decontamination index
  * becomes a narrow map + explode of the already-reduced hash set.
  */
case class TokenGramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "graft_token_grams"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  @transient private lazy val tokenPattern = java.util.regex.Pattern.compile("\\S+")
  @transient private lazy val md5 = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0xF)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = tokenPattern.matcher(text)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) tokens += m.group()
    val nG = tokens.length - k + 1
    if (nG < 1) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nG) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      md5.reset()
      md5.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      seen.add(UTF8String.fromString(hex(md5.digest())))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenGramHashes =
    copy(child = newChild)
}

/** `graft_winnow_fps(text, k, w)` → array<bigint> — the distinct winnowing
  * fingerprints of `text` (Schleimer/Wilkerson/Aiken, public algorithm):
  * xxhash64 every character k-gram (seed 42, bit-identical to SQL
  * `xxhash64(substring(text, i, k))`), then keep the min of each window of
  * w consecutive k-gram hashes, windows fully inside the document.
  * Sliding-window min via monotonic deque — O(n) per document.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def prettyName: String = "graft_winnow_fps"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val utf8 = input.asInstanceOf[UTF8String]
    val bytes = utf8.getBytes
    val offs = TextExpressions.charOffsets(bytes)
    val nChars = offs.length - 1
    // positions 1..max(n-k+1, 1); tail-short grams only in the degenerate
    // n<k case (mirrors the declarative sequence/substring formulation)
    val m = math.max(nChars - k + 1, 1)
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + k, nChars)
      h(i) = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(i),
        offs(end) - offs(i), 42L)
      i += 1
    }
    // windows start at p in [0, max(m-w, 0)], each min over h[p..min(p+w,m))
    val lastStart = math.max(m - w, 0)
    val fps = new java.util.LinkedHashSet[Long]()
    val deque = new Array[Int](m) // indices, increasing h-value front→back
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    i = 0
    while (p <= lastStart) {
      val windowEnd = math.min(p + w, m) // exclusive
      while (i < windowEnd) {
        while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
        deque(tail) = i; tail += 1
        i += 1
      }
      while (deque(head) < p) head += 1 // expire indices left of the window
      fps.add(h(deque(head)))
      p += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
