package graft.functions

import graft.SparkSpec
import graft.dedup.{MinHash, SimHash}
import org.apache.spark.sql.functions._

/** Bit-parity of the native dedup expressions against their declarative
  * references on real testdata — the native forms must be drop-in
  * replacements, not approximations.
  */
class DedupExpressionsSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("graft_xx_minhash_bands ≡ declarative shingles→signature→bandKeys") {
    graft.plans.GraftFunctions.register(spark)
    val d = docs.filter(MinHash.shingleFilter(col("text")))
    val declarative = d
      .select(col("doc_id"), MinHash.shingles(col("text")).as("sh"))
      .withColumn("sig", MinHash.signature(col("sh"), 16))
      .withColumn("band", explode(MinHash.bandKeys(col("sig"), 16, 4)))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val native = d
      .selectExpr("doc_id", "explode(graft_xx_minhash_bands(text, 16, 4, 3)) AS b")
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("graft_token_grams ≡ declarative posexplode + lead-window + md5 grams") {
    graft.plans.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val declarative = docs
      .selectExpr("doc_id",
        "SIZE(regexp_extract_all(text, '\\\\S+', 0)) AS nt",
        "POSEXPLODE(regexp_extract_all(text, '\\\\S+', 0)) AS (pos, tok)")
      .withColumn("gram", md5(concat_ws(" ",
        Seq(col("tok")) ++ (1 until k).map(j => lead(col("tok"), j).over(w)): _*)))
      .where(col("pos") <= col("nt") - k)
      .select(col("doc_id"), col("gram")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val native = docs
      .selectExpr("doc_id", s"EXPLODE(graft_token_grams(text, $k)) AS gram")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == declarative)
    assert(native.nonEmpty)
    // short docs (< k tokens) produce no grams, not an error
    import spark.implicits._
    assert(Seq((1L, "too short")).toDF("doc_id", "text")
      .selectExpr(s"graft_token_grams(text, $k) AS g")
      .collect().head.getSeq[String](0).isEmpty)
  }

  test("graft_shingles ≡ declarative array_distinct(transform(...)) shingles") {
    graft.plans.GraftFunctions.register(spark)
    val d = docs.filter(MinHash.shingleFilter(col("text")))
    val declarative = d.select(col("doc_id"), MinHash.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val native = d.selectExpr("doc_id", "graft_shingles(text, 3) AS sh")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("graft_simhash64 ≡ declarative vote accumulator") {
    val declarative = SimHash.withSimhashDeclarative(docs, "text")
      .select("doc_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = SimHash.withSimhash(docs, "text")
      .select("doc_id", "sim").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("graft_md5_bucket_score ≡ declarative MD5 AGGREGATE form") {
    graft.plans.GraftFunctions.register(spark)
    val T = graft.queries.Q.TokensExpr
    val w = "(ASCII(SUBSTRING(MD5(t), 1, 1)) * 256 + " +
      "ASCII(SUBSTRING(MD5(t), 2, 1))) % 61 - 30"
    val declarative = docs
      .selectExpr("doc_id", s"$T AS toks")
      .where("SIZE(toks) >= 1")
      .selectExpr("doc_id", "SIZE(toks) AS n",
        s"AGGREGATE(TRANSFORM(toks, t -> CAST($w AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x) AS s")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val native = docs
      .selectExpr("doc_id", "graft_md5_bucket_score(text) AS sc")
      .where("sc IS NOT NULL")
      .selectExpr("doc_id", "sc.n_tokens AS n", "sc.raw_score AS s")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(native == declarative)
    assert(native.nonEmpty)
  }

  test("graft_md5_bucket_score is null only on token-free text") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq((0L, "one two"), (1L, "   "), (2L, ""))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_md5_bucket_score(text) IS NULL AS isnull")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(0L -> false, 1L -> true, 2L -> true))
  }

  test("graft_md5_minhash ≡ declarative MD5 TRANSFORM/ARRAY_MIN form") {
    graft.plans.GraftFunctions.register(spark)
    val T = graft.queries.Q.TokensExpr
    val shingles =
      s"TRANSFORM(SEQUENCE(0, SIZE($T) - 3), " +
        s"i -> CONCAT(($T)[i], ' ', ($T)[i+1], ' ', ($T)[i+2]))"
    val sigCols = (0 until 4).map { k =>
      s"ARRAY_MIN(TRANSFORM($shingles, sh -> MD5(CONCAT('$k:', sh)))) AS mh_$k"
    }
    val d = docs.where(s"SIZE($T) >= 3")
    val declarative = d.selectExpr(Seq("doc_id") ++ sigCols: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    val native = d
      .selectExpr("doc_id", "graft_md5_minhash(text, 4) AS s")
      .selectExpr("doc_id", "s[0] AS mh_0", "s[1] AS mh_1", "s[2] AS mh_2", "s[3] AS mh_3")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(native == declarative)
    assert(native.nonEmpty)
  }
}
