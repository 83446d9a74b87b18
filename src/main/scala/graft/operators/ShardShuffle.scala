package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + sharding — the last step of a training
  * -data pipeline: examples must reach the trainer in a pseudo-random
  * order that is reproducible across re-runs (so a resumed/re-built
  * dataset yields the identical batch sequence).
  *
  * A seed-keyed md5 over the id decides BOTH shard membership and the
  * order within a shard, so the whole layout is a pure function of
  * (ids, seed, nShards) — no RNG state, no partition-order dependence.
  *
  * Scale shape: no global total order is materialized (a global
  * `row_number` would funnel 100 TB through one task). Shard assignment
  * is a narrow map; the within-shard ordering window partitions by
  * `shard_id`, so one task sorts one shard — `nShards` is the
  * parallelism and file-size knob, chosen so a shard is one training
  * file (1-4 GB at 100 TB ⇒ tens of thousands of shards, each a bounded
  * task). This matches how production pipelines lay out training data:
  * hash-assigned shard files, ordered within, shuffled across by the
  * reader.
  */
object ShardShuffle {

  /** Adds `shard_id` (0 until nShards) and `pos_in_shard` (1-based rank
    * in the shard's deterministic pseudo-random order) to `df`.
    *
    * `idCol` must be UNIQUE (like [[PrefixSum]]'s order key): the hash
    * string orders and `idCol` breaks md5-prefix ties, so the order is
    * total — and therefore reproducible — only for a unique id
    * population. Duplicate ids would tie on both sort keys and take
    * arrival-order positions, silently breaking the re-run guarantee.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int,
      seed: String = "42"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(!df.columns.contains("__graft_h"),
      "input must not carry the reserved column __graft_h")
    for (c <- Seq("shard_id", "pos_in_shard"))
      require(!df.columns.contains(c),
        s"input already has a $c column; assign() would clobber it")
    val h = md5(concat(lit(s"graft-shuffle:$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard_id")).orderBy(col("__graft_h"), col(idCol))
    df.withColumn("__graft_h", h)
      // first 8 hex chars → 32-bit uniform int; nonnegative, so % agrees
      // with every engine's remainder
      .withColumn("shard_id",
        expr("CAST(conv(substring(__graft_h, 1, 8), 16, 10) AS BIGINT)") % nShards)
      .withColumn("pos_in_shard", row_number().over(w))
      .drop("__graft_h")
  }
}
