package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data shaping operators over a text column: context-window
  * chunking and deterministic sequence packing — the prep steps between a
  * cleaned corpus and training shards.
  */
object TextOps {

  /** Canonical whitespace tokenizer (single source — `Q.TokensExpr` and
    * every text query derive from this; DuckDB twin:
    * `regexp_extract_all(c, '\S+')`).
    */
  def tokensExpr(column: String): String =
    s"regexp_extract_all($column, '\\\\S+', 0)"



  /** Fixed-size token chunks with overlap: chunk i covers tokens
    * [i·stride, i·stride + size). One row per (doc, chunk); narrow map +
    * explode, no shuffle. Token-less documents yield no chunks.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 32, stride: Int = 24): DataFrame = {
    require(size >= 1 && stride >= 1, "size and stride must be >= 1")
    docs.selectExpr(idCol, s"${tokensExpr(textCol)} AS toks")
      .where("SIZE(toks) > 0")
      .selectExpr(idCol, "toks",
        s"posexplode(sequence(0, CAST(FLOOR((SIZE(toks) - 1) / $stride) AS INT))) " +
          "AS (chunk_idx, _i)")
      .selectExpr(idCol, "chunk_idx",
        s"ARRAY_JOIN(SLICE(toks, chunk_idx * $stride + 1, $size), ' ') AS chunk_text",
        s"CAST(SIZE(SLICE(toks, chunk_idx * $stride + 1, $size)) AS INTEGER) " +
          "AS n_chunk_tokens")
  }

  /** Deterministic sequence packing: rows in `idCol` order fill
    * ~`targetTokens`-token bins (bin = floor(preceding-cumsum / target)).
    * The corpus cumsum runs through the distributed
    * [[graft.operators.PrefixSum]], not a global window. Returns one row
    * per input doc with its `bin_id`, `n_tokens` and running `cum`.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      targetTokens: Int = 2000): DataFrame = {
    require(targetTokens >= 1, "targetTokens must be >= 1")
    val counted = docs.selectExpr(idCol,
      s"SIZE(${tokensExpr(textCol)}) AS n_tokens")
    graft.operators.PrefixSum.runningTotal(counted, idCol, "n_tokens", "cum")
      .withColumn("bin_id",
        floor((col("cum") - col("n_tokens")) / targetTokens).cast("long"))
  }
}
