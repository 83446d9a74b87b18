package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring dedup — the suffix-array family of training-data
  * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better") re-expressed Spark-first: find every MAXIMAL token
  * span whose content is covered by K-grams that occur elsewhere in the
  * corpus (another document, or another position of the same one). The
  * fixed-gram decontamination surface (`text_decontaminate`) flags
  * membership; this surfaces the repeated SPANS themselves with their
  * extents — arbitrary-length repeats, not fixed windows.
  *
  * Shape: token K-grams keyed by a 128-bit md5 digest → one
  * hash-partitioned window over the digest (shuffle rows are 16-byte
  * digests + positions, never document text, never pairs) → flagged
  * positions → gaps-and-islands merge per document (windows [p, p+K-1]
  * overlapping or abutting fuse; the window partitions BY DOCUMENT, so
  * no single-partition sort) → span extents by one array-slice join
  * back to the tokenized docs.
  *
  * 100 TB cost: O(corpus tokens) gram rows is the family's inherent
  * floor (a suffix array is O(corpus) too); everything after the
  * duplicate filter is O(duplicated positions). No stage materializes
  * document pairs, and the only wide rows (the final slice join) carry
  * one token array per DOCUMENT with a span, joined by doc id.
  */
object SubstringDedup {

  /** (doc_id, ts) with a whitespace tokenization both query surfaces and
    * both DuckDB oracles share.
    */
  private def tokenized(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))

  /** One row per K-gram site: (doc_id, pos [1-based], g [md5 digest]). */
  private def gramSites(toks: DataFrame, k: Int): DataFrame = {
    import toks.sparkSession.implicits._
    toks
      .filter(size($"ts") >= k)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(1, size(ts) - ${k - 1}), " +
          s"i -> md5(concat_ws(' ', slice(ts, i, $k))))"))
        .as(Seq("p0", "g")))
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"g")
  }

  /** Gaps-and-islands: fuse flagged (doc_id, pos) coverage windows
    * [pos, pos+k-1] that overlap or abut (start within k of the previous)
    * into maximal spans (doc_id, span_start, span_ntokens).
    */
  private def fusedSpans(flagged: DataFrame, k: Int): DataFrame = {
    import flagged.sparkSession.implicits._
    val perDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    flagged
      .withColumn("brk",
        when($"pos" - lag($"pos", 1).over(perDoc) > k, 1).otherwise(0))
      .withColumn("island", sum($"brk").over(perDoc))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("span_start"),
        (max($"pos") - min($"pos") + k).as("span_ntokens"))
      .drop("island")
  }

  /** Maximal repeated spans: (doc_id, span_start, span_ntokens,
    * span_md5), token positions 1-based. `k` is the minimum repeat
    * granularity — spans shorter than `k` tokens are invisible, exactly
    * the suffix-array threshold parameter (Lee et al. use 50 BPE
    * tokens; the default 8 whitespace tokens suits the test corpus).
    */
  def repeatedSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8): DataFrame = {
    require(k >= 2, s"substring dedup needs k >= 2, got $k")
    import docs.sparkSession.implicits._
    val toks = tokenized(docs, idCol, textCol)
    // the global duplicate-gram set: count > 1 over (doc, pos) sites.
    // Count-over-window instead of groupBy+semi-join: one shuffle on the
    // digest and the gram stage runs ONCE (the join shape recomputed it
    // on both sides — measured 6.8 s → 5.7 s at sf0.1). Groups are
    // per-gram (tiny), so the window never degenerates to one partition.
    val perGram = Window.partitionBy($"g")
    val flagged = gramSites(toks, k)
      .withColumn("n", count(lit(1)).over(perGram))
      .filter($"n" > 1)
      .select($"doc_id", $"pos")
    fusedSpans(flagged, k).join(toks, "doc_id")
      .select($"doc_id", $"span_start", $"span_ntokens",
        md5(concat_ws(" ", expr(
          "slice(ts, cast(span_start as int), cast(span_ntokens as int))")))
          .as("span_md5"))
  }

  /** The dedup ACTION of the family (Lee et al. remove all but one copy
    * of each repeated substring): excise every token covered by a
    * duplicated K-gram instance that is NOT the gram's globally-first
    * site (minimal (doc_id, pos) — deterministic, so the kept copy is
    * stable across runs and engines). Returns one row per document:
    * (doc_id, n_kept, kept_md5) — the cleaned token count and a digest
    * of the cleaned text (an exact duplicate of an earlier doc cleans to
    * the empty string). Cost shape: the [[repeatedSpans]] stages with a
    * min-site struct over the same gram window — still one digest-keyed
    * shuffle, O(duplicated positions) afterwards.
    */
  def removeLaterOccurrences(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8): DataFrame = {
    require(k >= 2, s"substring dedup needs k >= 2, got $k")
    import docs.sparkSession.implicits._
    val toks = tokenized(docs, idCol, textCol)
    // later occurrences: instances that are not their gram's minimal
    // (doc_id, pos) site — a unique gram's only instance IS the minimum,
    // so non-duplicates drop out without a separate count
    val perGram = Window.partitionBy($"g")
    val later = gramSites(toks, k)
      .withColumn("mn", min(struct($"doc_id", $"pos")).over(perGram))
      .filter(struct($"doc_id", $"pos") =!= $"mn")
      .select($"doc_id", $"pos")
    val spans = fusedSpans(later, k)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"span_start", $"span_ntokens")).as("rm"))
    toks.join(spans, Seq("doc_id"), "left")
      .select($"doc_id", expr(
        "filter(transform(ts, (t, i) -> struct(t AS t, CAST(i + 1 AS BIGINT) AS p)), " +
          "x -> rm IS NULL OR NOT exists(rm, " +
          "r -> x.p >= r.span_start AND x.p < r.span_start + r.span_ntokens))")
        .as("kept"))
      .select($"doc_id",
        size($"kept").cast("long").as("n_kept"),
        md5(concat_ws(" ", expr("transform(kept, x -> x.t)"))).as("kept_md5"))
  }
}
