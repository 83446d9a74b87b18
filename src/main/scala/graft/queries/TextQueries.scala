package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-training-data text operators over `documents.parquet`: exact dedup,
  * text statistics, quality scoring, document fingerprinting, language
  * heuristics, and an oracle-able MinHash (MD5-based; the xxhash64 scale
  * variant lives in [[graft.dedup.MinHash]]).
  *
  * All pure Column expressions — tokenization via `regexp_extract_all`,
  * set math via array higher-order functions; mirrored 1:1 in the DuckDB
  * oracle (list_* functions), including the accumulation order.
  */
object TextQueries {
  import Q.{QueryFn, TokensExpr}

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  /** BPE pre-tokenizer (letter runs / digit runs / single punctuation) as a
    * Spark SQL expression — shared by `text_token_bpe` and
    * `text_bpe_pair_freq`. The oracle twin spells the whitespace class out
    * (Java `\s` ⊃ RE2 `\s` on `\x0B`, ADVICE r4).
    */
  private val BpeTokens =
    "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"

  /** The four Gopher rule predicates over the stat columns (n_tokens,
    * sum_tok_len, n_alpha, n_stop). Syntactically valid in BOTH Spark SQL
    * and DuckDB, so `text_gopher_rules`, `pipeline_llm_curate`, and both
    * of their oracles read the thresholds from this ONE definition — the
    * stat computations differ per engine (SIZE/FILTER vs LEN/LIST_*),
    * the decisions cannot drift.
    */
  /** The Spark-side Gopher stat columns the rules read — shared by
    * `text_gopher_rules` and `pipeline_llm_curate`.
    */
  private val GopherStatExprs = Seq(
    s"SIZE($TokensExpr) AS n_tokens",
    s"AGGREGATE($TokensExpr, 0, (a, t) -> a + LENGTH(t)) AS sum_tok_len",
    s"SIZE(FILTER($TokensExpr, t -> t RLIKE '[A-Za-z]')) AS n_alpha",
    s"SIZE(FILTER($TokensExpr, t -> t IN (${inList(Stopwords)}))) AS n_stop")

  private val GopherRules = Seq(
    "n_tokens BETWEEN 5 AND 10000",
    "CAST(sum_tok_len AS DOUBLE) / n_tokens BETWEEN 3 AND 10",
    "CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8",
    "n_stop >= 2")
  private val GopherPass = GopherRules.mkString(" AND ")

  /** Per-source sampling-rate thresholds (first md5 byte as hex) —
    * shared, engine-valid-in-both, by `sample_mix_weighted`,
    * `pipeline_llm_curate`, and their oracles.
    */
  private val MixCase =
    "CASE WHEN lang = 'en' THEN '40' WHEN lang = 'de' THEN '80' ELSE 'c0' END"

  /** Epoch-weighted upsampling constants (mixture weights en=2.5, de=1.25,
    * else 1.0): integer part as base epoch count, fractional part as a
    * first-md5-byte threshold — engine-valid-in-both, shared by
    * `sample_upsample_epochs` and its oracle.
    */
  private val EpochBase = "CASE WHEN lang = 'en' THEN 2 ELSE 1 END"
  private val EpochFracHex =
    "CASE WHEN lang = 'en' THEN '80' WHEN lang = 'de' THEN '40' ELSE '00' END"

  /** Min-frequency thresholds for the vocabulary coverage curve, shared
    * by `text_vocab_coverage` and its oracle.
    */
  private val VocabMinFreqs = Seq(1, 2, 5, 10, 20, 50, 100)

  /** Temperature exponent for `sample_mix_temperature` (XLM-R's 0.7),
    * shared with the oracle.
    */
  private val MixAlpha = "0.7"

  /** BM25 query-term set (terms from the fixture vocabulary), shared by
    * `text_bm25_topk` and its oracle.
    */
  private val Bm25Terms = Seq("spark", "merge", "window")

  /** Per-(doc, term) BM25 contribution in micro-units — Robertson k1=1.2,
    * b=0.75, Lucene-style idf ln(1 + (N - df + 0.5)/(df + 0.5)). The
    * SAME double expression text runs in Spark SQL and DuckDB (it reads
    * columns tf, df, dl, n_docs, sum_dl), and each contribution is
    * micro-rounded BEFORE the per-doc integer sum, so the final score is
    * independent of summation order — engine-comparable and
    * cluster-stable.
    */
  private val Bm25ContribExpr =
    "CAST(ROUND(LN(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * " +
      "(tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / " +
      "(CAST(sum_dl AS DOUBLE) / n_docs))) * 1000000) AS BIGINT)"

  /** Per-bigram DSIR log-ratio contribution in micro-units: add-0.5
    * smoothing over 256 first-md5-byte buckets (reads columns ct, cr,
    * t_t, t_r — target/raw bucket counts and totals). Shared verbatim
    * with the oracle; micro-rounded before the per-doc integer sum.
    */
  private val DsirContribExpr =
    "CAST(ROUND((LN((ct + 0.5) / (t_t + 128.0)) - " +
      "LN((cr + 0.5) / (t_r + 128.0))) * 1000000) AS BIGINT)"

  /** Per-(doc, term) entropy contribution in nano-units: −p·ln(p) with
    * p = c/n (term count over doc length). Shared verbatim with the
    * oracle; nano-rounded BEFORE the per-doc integer sum so the entropy
    * is independent of summation order.
    */
  private val EntropyContribExpr =
    "CAST(ROUND(-(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n) " +
      "* 1000000000) AS BIGINT)"

  /** Per-(source, term) KL contribution in nano-units:
    * p_s·ln(p_s/p) with p_s = c_st/n_s (in-source term probability) and
    * p = c_t/n_tot (corpus term probability). Shared verbatim with the
    * oracle; nano-rounded before the per-source integer sum.
    */
  private val KlContribExpr =
    "CAST(ROUND((CAST(c_st AS DOUBLE) / n_s) * " +
      "LN((CAST(c_st AS DOUBLE) / n_s) / (CAST(c_t AS DOUBLE) / n_tot)) " +
      "* 1000000000) AS BIGINT)"

  /** Zipf-slope regression scalars from milli-rounded (x, y) =
    * (ln rank, ln freq): OLS slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    * computed from EXACT integer sums (order-independent), the final
    * division in double with an identical expression shape in both
    * engines, micro-rounded. Reads columns n, s1, s2, s11, s12.
    */
  private val ZipfSlopeExpr =
    "CAST(ROUND((CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2) / " +
      "(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1) " +
      "* 1000000) AS BIGINT)"

  /** Corpus-wide suffix giving `dedup_paragraph_global` a deterministic
    * cross-corpus repeated segment (kept only at its global first
    * occurrence); shared with the oracle. No quotes/backslashes — it is
    * embedded in single-quoted SQL literals on both sides.
    */
  private val ParaSuffix = ". Subscribe to our newsletter today. Thanks for reading"

  val defs: Map[String, QueryFn] = Map(
    // Exact dedup via group-by text: deterministic keeper (min doc_id).
    "dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy($"text")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    }),

    // Exact SUBSTRING dedup (Lee et al. 2022's suffix-array family —
    // graft.dedup.SubstringDedup): maximal token spans covered by
    // duplicated 8-grams, with extents and a content digest. FULL
    // oracle: DuckDB recomputes grams → duplicate set → gaps-and-islands
    // → span digests on the same tokenization.
    "dedup_substring_spans" -> ((s, dir) =>
      graft.dedup.SubstringDedup.repeatedSpans(Tables.documents(s, dir))),

    // The dedup ACTION of the same family: excise every token covered by
    // a duplicated 8-gram instance that is not the gram's globally-first
    // (doc_id, pos) site — Lee et al.'s remove-all-but-one-copy, with a
    // deterministic kept copy. FULL oracle recomputes the removal and the
    // cleaned-text digests in SQL.
    "dedup_substring_removed" -> ((s, dir) =>
      graft.dedup.SubstringDedup.removeLaterOccurrences(
        Tables.documents(s, dir))),

    // Exact dedup on content hash (the scalable form: group on a 128-bit
    // digest, not the full text — at 100 TB the shuffle carries 16 bytes
    // per row instead of the document).
    "dedup_exact_hash" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    }),

    // Text statistics: chars/bytes/tokens/distinct tokens/avg token length.
    "text_stats" -> ((s, dir) => {
      Tables.documents(s, dir).selectExpr(
        "doc_id",
        "LENGTH(text) AS n_chars_c",
        "OCTET_LENGTH(text) AS n_bytes",
        s"SIZE($TokensExpr) AS n_tokens",
        s"SIZE(ARRAY_DISTINCT($TokensExpr)) AS n_uniq_tokens",
        s"CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / SIZE($TokensExpr) AS avg_tok_len")
    }),

    // BPE-ish tokenization: letter runs / digit runs / single punctuation —
    // the pre-tokenizer split shape BPE vocabularies assume.
    "text_token_bpe" -> ((s, dir) => {
      Tables.documents(s, dir).selectExpr(
        "doc_id",
        s"SIZE($BpeTokens) AS n_bpe_tokens",
        s"SIZE(ARRAY_DISTINCT($BpeTokens)) AS n_bpe_uniq")
    }),

    // Quality scoring: stopword ratio + banding (length/stopword heuristics).
    "text_quality" -> ((s, dir) => {
      Tables.documents(s, dir).selectExpr(
        "doc_id",
        s"SIZE($TokensExpr) AS n_tokens",
        s"SIZE(FILTER($TokensExpr, t -> t IN (${inList(Stopwords)}))) AS n_stop")
        .selectExpr("doc_id", "n_tokens", "n_stop",
          "CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio",
          "CASE WHEN n_tokens < 10 THEN 'short' " +
            "WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.2 THEN 'stopwordy' " +
            "ELSE 'ok' END AS quality_band")
    }),

    // Document fingerprint: digest of whitespace-normalized lowercased text.
    // Explicit whitespace class: Java \s ⊃ RE2 \s on \x0B (ADVICE r4).
    "text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).selectExpr(
        "doc_id",
        "MD5(LOWER(REGEXP_REPLACE(text, '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+', ' '))) AS fp")
    }),

    // Language distribution over the typed lang column.
    "lang_dist" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        avg($"n_chars").as("avg_chars"))
    }),

    // Language-ID heuristic: stopword-list scoring with a fixed tie-break
    // (en > de > es > fr). Deterministic on any text.
    "lang_id_ngram" -> ((s, dir) => {
      val en = inList(Seq("the", "and", "of", "to", "is"))
      val de = inList(Seq("der", "die", "das", "und", "ist"))
      val es = inList(Seq("el", "la", "de", "que", "y"))
      val fr = inList(Seq("le", "les", "et", "des", "un"))
      Tables.documents(s, dir).selectExpr(
        "doc_id", "lang",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($en))) AS s_en",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($de))) AS s_de",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($es))) AS s_es",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($fr))) AS s_fr")
        .selectExpr("doc_id", "lang",
          "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' " +
            "WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' " +
            "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang")
    }),

    // The composed training-corpus cleaning funnel — the LLM-pipeline
    // stages chained the way a real corpus build runs them:
    //   1. language ID, keep predicted-English;
    //   2. quality gate (not short, not stopwordy);
    //   3. exact dedup on content hash (keeper = min doc_id);
    //   4. near-dup collapse: identical 4-hash MD5-MinHash signatures
    //      group together, one survivor per group.
    // Every stage is engine-exact, so the whole funnel is oracle-checked.
    "corpus_clean_e2e" -> ((s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val en = inList(Seq("the", "and", "of", "to", "is"))
      val de = inList(Seq("der", "die", "das", "und", "ist"))
      val es = inList(Seq("el", "la", "de", "que", "y"))
      val fr = inList(Seq("le", "les", "et", "des", "un"))
      val scored = Tables.documents(s, dir).selectExpr(
        "doc_id", "text",
        s"SIZE($TokensExpr) AS n_tokens",
        s"SIZE(FILTER($TokensExpr, t -> t IN (${inList(Stopwords)}))) AS n_stop",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($en))) AS s_en",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($de))) AS s_de",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($es))) AS s_es",
        s"SIZE(FILTER($TokensExpr, t -> t IN ($fr))) AS s_fr")
      val kept = scored
        .filter("s_en >= s_de AND s_en >= s_es AND s_en >= s_fr") // en
        .filter("n_tokens >= 10 AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.2")
      val exact = kept.groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("doc_id"), min($"text").as("text"),
          expr("min_by(n_tokens, doc_id)").as("n_tokens"),
          count(lit(1)).as("n_exact_copies"))
      val sigCols = (0 until 4).map(k => s"ELEMENT_AT(__sig, ${k + 1}) AS mh_$k")
      exact
        .selectExpr("doc_id", "n_tokens", "n_exact_copies",
          "graft_md5_minhash(text, 4) AS __sig")
        .selectExpr(Seq("doc_id", "n_tokens", "n_exact_copies") ++ sigCols: _*)
        .groupBy($"mh_0", $"mh_1", $"mh_2", $"mh_3")
        .agg(min($"doc_id").as("keep_id"),
          expr("min_by(n_tokens, doc_id)").as("n_tokens"),
          sum($"n_exact_copies").as("n_members"))
        .select($"keep_id", $"n_tokens", $"n_members")
    }),

    // Training-window chunking: fixed-size token chunks (32) with stride 24
    // (8-token overlap) — the context-window prep step of a training-data
    // pipeline. One row per (doc, chunk); narrow map + explode, no shuffle.
    "text_chunking" -> ((s, dir) =>
      graft.text.TextOps.chunkTokens(Tables.documents(s, dir), "doc_id", "text",
        size = 32, stride = 24)),

    // Deterministic sequence packing: docs in doc_id order fill ~2000-token
    // bins (bin = floor(preceding-cumsum / target)) — the batch-packing
    // prep for training shards. The cumsum runs through the distributed
    // two-phase PrefixSum, not a global window (which would shuffle the
    // whole corpus into one task).
    "text_seq_packing" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextOps.packSequences(Tables.documents(s, dir), "doc_id", "text",
          targetTokens = 2000)
        .groupBy($"bin_id")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("total_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
    }),

    // Oracle-able MinHash (4 hashes, MD5-keyed, lexicographic min over
    // token 3-gram shingles). Deterministic across engines because MD5 and
    // string min are engine-independent — unlike xxhash64 (see
    // graft.dedup.MinHash for the fast variant).
    "dedup_minhash_md5" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val sigCols = (0 until 4).map(k => s"ELEMENT_AT(__sig, ${k + 1}) AS mh_$k")
      Tables.documents(s, dir)
        .where(s"SIZE($TokensExpr) >= 3")
        .selectExpr("doc_id", "graft_md5_minhash(text, 4) AS __sig")
        .selectExpr(Seq("doc_id") ++ sigCols: _*)
    }),

    // PII redaction — the scrubbing pass every training corpus runs
    // before release: emails → <EMAIL>, IPv4 → <IP>, long digit runs →
    // <NUM>. Patterns are planted deterministically per doc (the fixture
    // has no natural PII) so every row exercises every rule. Regexes use
    // only constructs Java and RE2 interpret identically (explicit
    // classes, counted quantifiers — no \d/\s dialect divergence).
    "text_redact_pii" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
      val ip = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
      val num = "[0-9]{7,}"
      Tables.documents(s, dir).selectExpr(
        "doc_id",
        "CONCAT(text, ' contact user', CAST(doc_id AS STRING), " +
          // + 1000000 keeps the digit run ≥ 7 digits for EVERY doc_id
          // (doc_id = 0 would otherwise plant '5550', below the {7,} gate).
          "'@mail.example.org or call 555', CAST(doc_id * 7919 + 1000000 AS STRING), " +
          "' from 10.0.', CAST(doc_id % 256 AS STRING), '.7') AS raw")
        .selectExpr("doc_id",
          s"SIZE(REGEXP_EXTRACT_ALL(raw, '$email', 0)) AS n_emails",
          s"SIZE(REGEXP_EXTRACT_ALL(raw, '$ip', 0)) AS n_ips",
          s"SIZE(REGEXP_EXTRACT_ALL(raw, '$num', 0)) AS n_nums",
          s"REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(raw, " +
            s"'$email', '<EMAIL>'), '$ip', '<IP>'), '$num', '<NUM>') AS red_text")
    }),

    // k-anonymity audit — the re-identification risk report a governed
    // corpus release runs next to PII redaction: every quasi-identifier
    // combination backed by fewer than k individuals is a linkage
    // attack surface. Quasi-identifiers here are nation × segment ×
    // coarse balance bin (the classic demographic triple); groups with
    // n < 5 are the rows a release must suppress or generalize. One
    // hash aggregate — the same plan at 100 TB.
    "privacy_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_nationkey", $"c_mktsegment",
          floor($"c_acctbal" / 2000).cast("long").as("bal_bin"))
        .agg(count(lit(1)).as("n"))
        .filter($"n" < 5)
    }),

    // l-diversity audit — k-anonymity's complement: a group can be
    // large yet still leak if everyone in it shares the SENSITIVE value
    // (here: the market segment within a nation × balance-bin cohort).
    // Groups with fewer than 2 distinct sensitive values are
    // homogeneous-attack surfaces even when n ≥ k.
    "privacy_l_diversity" -> ((s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_nationkey",
          floor($"c_acctbal" / 2000).cast("long").as("bal_bin"))
        .agg(count(lit(1)).as("n"),
          countDistinct($"c_mktsegment").as("l"))
        .filter($"l" < 2)
    }),

    // Oracle-able LSH banding over the MD5 MinHash signature: 2 bands of
    // 2 hashes, band key = MD5 of the concatenated band — the
    // signature→band→bucket-key step of the LSH join, proven cross-engine
    // (the xxhash64 scale path is graft_xx_minhash_bands, rows-only).
    "dedup_lsh_bands_md5" -> ((s, dir) =>
      md5LshBands(Tables.documents(s, dir))),

    // Train/eval split + near-dup LEAKAGE AUDIT — the step after
    // decontamination a training pipeline runs before freezing an eval
    // set: split deterministically (hash of doc_id, ~12.5% eval), then
    // find eval docs whose LSH band keys collide with any train doc —
    // near-duplicate leakage that inflates eval scores. The planted
    // corpus (every 25th doc borrows its neighbor's text) guarantees
    // cross-split dup pairs exist. Scale shape: the audit is the SAME
    // band-key equi-join as the dedup paths (16-64 B band rows, never
    // text, never all-pairs); the split itself is a narrow map.
    "sample_split_leakage" -> ((s, dir) => {
      import s.implicits._
      val docs = plantedCorpus(Tables.documents(s, dir))
        .withColumn("is_eval",
          expr("SUBSTRING(MD5(CONCAT('split:', CAST(doc_id AS STRING))), 1, 1)" +
            " IN ('0', '1')"))
      val bands = md5LshBands(docs)
        .join(docs.select($"doc_id", $"is_eval"), Seq("doc_id"))
      bands.filter($"is_eval")
        .select($"doc_id".as("eval_doc"), $"band_idx", $"band_key")
        .join(bands.filter(!$"is_eval")
          .select($"doc_id".as("train_doc"), $"band_idx", $"band_key"),
          Seq("band_idx", "band_key"))
        .select($"eval_doc", $"train_doc").distinct()
        .groupBy($"eval_doc").agg(count(lit(1)).as("n_leaky_train_docs"))
    }),

    // INCREMENTAL dedup — the daily-batch shape a 100 TB corpus actually
    // runs (dedupe the new 20% against the standing 80%, never re-dedupe
    // the corpus): exact dups via a content-hash join against the corpus
    // hash set, near-dup CANDIDATES via the LSH band-key equi-join against
    // the corpus band index. Both sides are indexes (16-64 bytes/row), the
    // batch side is the small one — broadcast at this scale, bucketed at
    // 100 TB. Exact dups are planted (every 25th batch doc takes its
    // corpus neighbor's text) so the exact branch is exercised.
    "dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val all = plantedCorpus(Tables.documents(s, dir))
      val corpus = all.filter($"doc_id" % 5 =!= 0) // standing corpus (80%)
      val batch = all.filter($"doc_id" % 5 === 0)  // today's landing (20%)
      val exactHits = batch.select($"doc_id", md5($"text").as("h"))
        .join(corpus.select(md5($"text").as("h")).distinct(), Seq("h"))
        .select($"doc_id").distinct().withColumn("is_exact_dup", lit(true))
      val candHits = md5LshBands(batch)
        .join(md5LshBands(corpus)
          .select($"band_idx", $"band_key", $"doc_id".as("corpus_id")),
          Seq("band_idx", "band_key"))
        .select($"doc_id", $"corpus_id").distinct()
        .groupBy($"doc_id").agg(count(lit(1)).as("n_candidates"))
      batch.select($"doc_id")
        .join(exactHits, Seq("doc_id"), "left")
        .join(candHits, Seq("doc_id"), "left")
        .selectExpr("doc_id",
          "COALESCE(is_exact_dup, false) AS is_exact_dup",
          "CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates")
    }),

    // Cross-document BOILERPLATE removal (the C4/RefinedWeb repeated-
    // segment dedup): segment each doc on sentence boundaries, count each
    // segment's document frequency across the corpus, flag segments
    // appearing in ≥ 50% of docs as boilerplate, and reconstruct the
    // cleaned text from the surviving segments in order. Boilerplate is
    // PLANTED (a footer on every doc, a promo line on half) so the hit
    // path is exercised on any corpus, and every doc keeps a unique
    // closing line so reconstruction is never empty. Scale shape: one
    // explode shuffle carrying (segment, doc) pairs, an equi-join on the
    // segment key, and a per-doc ordered re-assembly — no all-pairs
    // anything; at 100 TB the join key becomes md5(segment).
    "text_boilerplate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).selectExpr("doc_id",
        "CONCAT(text, '. Subscribe to our newsletter today. ', " +
          "CASE WHEN doc_id % 2 = 0 THEN 'Visit example dot com for more. ' ELSE '' END, " +
          "'Doc ', CAST(doc_id AS STRING), ' unique closing line.') AS raw")
      val n = docs.count() // corpus size for the relative threshold (1 scalar)
      val segs = docs
        .repartition($"doc_id") // single-file source: spread the explode fan-out
        .selectExpr("doc_id", "POSEXPLODE(SPLIT(raw, '[.][ ]')) AS (pos, seg0)")
        .selectExpr("doc_id", "pos", "TRIM(seg0) AS seg")
        .where("seg != ''")
      val freq = segs.groupBy($"seg").agg(countDistinct($"doc_id").as("df"))
      segs.join(freq, Seq("seg"))
        .selectExpr("doc_id", "pos", "seg", s"df >= ${n * 0.5} AS is_b")
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_segments"),
          sum(when($"is_b", 1L).otherwise(0L)).as("n_boilerplate"),
          array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN NOT is_b " +
              "THEN named_struct('pos', pos, 'seg', seg) END)), x -> x.seg)"),
            ". ").as("clean_text"))
    }),

    // PERSISTED incremental dedup — dedup_incremental's join shape with
    // the standing index living as append-only MedallionTables
    // (graft.dedup.StandingDedupIndex): batch 1 (the 80% corpus) WRITES
    // the hash-set + band-index tables, batch 2 dedups against the index
    // READ BACK from disk, then ingests its own keys, and a post-ingest
    // re-check proves the maintenance half (every batch doc now exact-dups
    // its own indexed hash; candidates include itself). Day-2's report is
    // materialized to scratch BEFORE the day-2 ingest — check() is lazy
    // and would otherwise count the batch against itself.
    "dedup_index_persisted" -> ((s, dir) => {
      import s.implicits._
      val work = Q.scratch(dir, "dedup_index")
      Q.deleteDir(s, work)
      val all = plantedCorpus(Tables.documents(s, dir))
      val corpus = all.filter($"doc_id" % 5 =!= 0) // day-1 landing (80%)
      val batch = all.filter($"doc_id" % 5 === 0)  // day-2 landing (20%)
      val idx = new graft.dedup.StandingDedupIndex(s, work, md5LshBands)
      idx.ingest(corpus)
      val day2 = s"$work/day2_report"
      idx.check(batch).write.mode("overwrite").parquet(day2)
      idx.ingest(batch)
      val after = idx.check(batch).selectExpr("doc_id",
        "is_exact_dup AS exact_after", "n_candidates AS n_candidates_after")
      s.read.parquet(day2).join(after, Seq("doc_id"))
        .select("doc_id", "is_exact_dup", "n_candidates",
          "exact_after", "n_candidates_after")
    }),

    // The compaction twin of dedup_index_persisted: the day-1 corpus
    // lands as THREE daily tags, tags 1-2 are folded into the archive
    // partition (StandingDedupIndex.compactThrough), and the day-2 check
    // must be BIT-IDENTICAL to checking against an uncompacted index
    // holding the same keys — the oracle recomputes the check from the
    // corpus directly and knows nothing about tags or archives, so any
    // row lost or duplicated-into-visibility by compaction breaks the
    // hash.
    "dedup_index_compacted" -> ((s, dir) => {
      import s.implicits._
      val work = Q.scratch(dir, "dedup_index_compact")
      Q.deleteDir(s, work)
      val all = plantedCorpus(Tables.documents(s, dir))
      val corpus = all.filter($"doc_id" % 5 =!= 0)
      val batch = all.filter($"doc_id" % 5 === 0)
      val idx = new graft.dedup.StandingDedupIndex(s, work, md5LshBands)
      idx.ingest(corpus.filter($"doc_id" % 3 === 0), tag = 1L)
      idx.ingest(corpus.filter($"doc_id" % 3 === 1), tag = 2L)
      idx.ingest(corpus.filter($"doc_id" % 3 === 2), tag = 3L)
      idx.compactThrough(2L)
      idx.check(batch)
    }),

    // DECISION-level cross-check of the xxhash scale path against the
    // oracled MD5 twin: run BOTH near-dup pipelines over the planted-dup
    // corpus and emit, for every ground-truth identical-text pair, whether
    // each path found it. DuckDB cannot recompute xxhash64 — but it CAN
    // predict the xxhash path's decisions HERE: identical text ⇒ identical
    // signature ⇒ identical band keys ⇒ bucket-mates ⇒ exact Jaccard 1 ≥
    // threshold, under ANY deterministic hash scheme. So the oracle's
    // expected row is (true, true, agree) for every pair, and a banding,
    // band-join, or Jaccard-gate bug in the scale path flips xx_found into
    // a hash mismatch. Probabilistic sub-identical recall stays out of the
    // output (left join FROM truth), keeping it deterministic.
    "dedup_decision_xcheck" -> ((s, dir) => {
      import s.implicits._
      graft.plans.GraftFunctions.register(s)
      val planted = plantedCorpus(Tables.documents(s, dir))
      val eligible = planted.where(s"SIZE($TokensExpr) >= 3")
      val hashed = eligible.select($"doc_id", md5($"text").as("h"))
      val truth = hashed.select($"doc_id".as("id_a"), $"h")
        .join(hashed.select($"doc_id".as("id_b"), $"h"), Seq("h"))
        .filter($"id_a" < $"id_b")
        .select("id_a", "id_b")
      val xx = graft.dedup.MinHash
        .nearDuplicates(planted, "doc_id", "text", threshold = 0.9)
        .select($"id_a", $"id_b").withColumn("xx", lit(true))
      val bands = md5LshBands(planted)
      val md5Cand = bands.select($"doc_id".as("id_a"), $"band_idx", $"band_key")
        .join(bands.select($"doc_id".as("id_b"), $"band_idx", $"band_key"),
          Seq("band_idx", "band_key"))
        .filter($"id_a" < $"id_b").select("id_a", "id_b").distinct()
      val sh = eligible.selectExpr("doc_id", "graft_shingles(text, 3) AS sh")
      val md5Found = md5Cand
        .join(sh.select($"doc_id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
        .join(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
        .where(graft.dedup.MinHash.jaccard($"sh_a", $"sh_b") >= 0.9)
        .select("id_a", "id_b").withColumn("m5", lit(true))
      truth.join(xx, Seq("id_a", "id_b"), "left")
        .join(md5Found, Seq("id_a", "id_b"), "left")
        .selectExpr("id_a", "id_b",
          "COALESCE(xx, false) AS xx_found",
          "COALESCE(m5, false) AS md5_found",
          "COALESCE(xx, false) = COALESCE(m5, false) AS agree")
    }),

    // DECISION-level cross-check for the remaining xx fingerprint paths
    // (the dedup_decision_xcheck recipe): on every planted identical-text
    // pair — doc k (k%25==0) takes doc k+1's text, so the pair is
    // (k, k+1) — the 64-bit xxhash SimHash banded-Hamming path must find
    // the pair at Hamming 0 (identical text ⇒ identical token votes ⇒
    // identical fingerprint ⇒ every band shared), and the xx winnowing
    // fingerprint SETS must be exactly equal (count-of-A = count-of-B =
    // shared count; a mere shared-candidate check would pass for ANY two
    // docs sharing one 5-gram). Bounded to doc_id < 200 like the pair
    // oracles; the oracle predicts every decision without recomputing
    // xxhash64.
    "dedup_xx_planted_decisions" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val planted = plantedCorpus(docs).where("doc_id < 200")
      // pair (id_a = k, id_b = k+1): built off doc k+1's row (its text is
      // what doc k received), inner-joined to doc k's row for existence
      val pairs = docs.select($"doc_id".as("id_b"), $"text")
        .join(docs.select(($"doc_id" + 1).as("id_b"), $"doc_id".as("id_a")),
          Seq("id_b"))
        .where("id_a % 25 = 0 AND id_b < 200 AND LENGTH(text) >= 1")
        .select("id_a", "id_b")
      val simFound = graft.dedup.SimHash
        .nearDuplicates(planted, "doc_id", "text", maxHamming = 3)
      val idx = graft.dedup.Winnowing.fingerprintIndex(planted, "doc_id", "text")
      val nFp = idx.groupBy($"doc_id").agg(count(lit(1)).as("n_fp"))
      val shared = idx.select($"doc_id".as("id_a"), $"fp")
        .join(idx.select($"doc_id".as("id_b"), $"fp"), Seq("fp"))
        .join(pairs, Seq("id_a", "id_b"))
        .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("n_shared"))
      pairs
        .join(simFound, Seq("id_a", "id_b"), "left")
        .join(nFp.select($"doc_id".as("id_a"), $"n_fp".as("n_fp_a")), Seq("id_a"), "left")
        .join(nFp.select($"doc_id".as("id_b"), $"n_fp".as("n_fp_b")), Seq("id_b"), "left")
        .join(shared, Seq("id_a", "id_b"), "left")
        .selectExpr("id_a", "id_b",
          "CAST(COALESCE(hamming, -1) AS INT) AS simhash_hamming",
          "hamming IS NOT NULL AS simhash_found",
          "COALESCE(n_fp_a, 0) = COALESCE(n_fp_b, 0) AND " +
            "COALESCE(n_shared, 0) = COALESCE(n_fp_a, 0) AND " +
            "COALESCE(n_fp_a, 0) > 0 AS winnow_sets_equal")
    }),

    // Oracle-able SimHash (16-bit, MD5 bit-planes over whitespace tokens).
    // Each token votes ±1 per bit; bit = 1 iff the vote sum is >= 0. The
    // hex-digit arithmetic (INSTR on the hex alphabet, DIV/% bit extract)
    // is engine-independent, unlike the xxhash-based 64-bit fast path in
    // `dedup_simhash` (graft.dedup.SimHash) — this twin proves the simhash
    // SEMANTICS cross-engine; the native expression covers scale.
    "dedup_simhash_md5" -> ((s, dir) => md5Simhash16(s, dir)),

    // Banded-Hamming near-dup PAIRS over the oracled 16-bit simhash —
    // the retrieval step the fingerprint exists for: 4 bands of 4 bits;
    // by pigeonhole any pair within Hamming distance 3 shares at least
    // one band, so candidates come from an equi-join on (band, nibble) —
    // never doc×doc — and the exact popcount gate drops false positives.
    // Bounded to 1000 docs like the other pair oracles: at 16 bits a full
    // corpus drowns in chance collisions; the unbounded scale path is the
    // 64-bit xxhash SimHash (graft.dedup.SimHash) with 16-bit bands.
    "dedup_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      val sh = md5Simhash16(s, dir).where($"doc_id" < 1000)
      val bands = sh.selectExpr("doc_id", "simhash16",
          "EXPLODE(SEQUENCE(0, 3)) AS band_idx")
        .selectExpr("doc_id", "simhash16", "band_idx",
          "CAST(SHIFTRIGHT(simhash16, band_idx * 4) & 15 AS INT) AS nib")
      val a = bands.selectExpr("doc_id AS id_a", "simhash16 AS code_a",
        "band_idx", "nib")
      val b = bands.selectExpr("doc_id AS id_b", "simhash16 AS code_b",
        "band_idx", "nib")
      a.join(b, Seq("band_idx", "nib"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", $"code_a", $"code_b")
        .distinct() // a pair can share several bands
        .selectExpr("id_a", "id_b",
          "CAST(BIT_COUNT(code_a ^ code_b) AS INT) AS hamming")
        .where("hamming <= 3")
    }),

    // Oracle-able winnowing (MD5 char-5-gram hashes, window 4, distinct
    // window minima): same window-min shape as graft.dedup.Winnowing but
    // with engine-independent hashes and position-free output — proves the
    // fingerprint-set semantics cross-engine; the rolling-hash native
    // expression covers scale. Bounded to 100 docs like text_winnow_pairs.
    //
    // Shape: ROWS, not nested array lambdas. The earlier TRANSFORM-over-
    // SLICE formulation was quadratic after InferFiltersFromGenerate +
    // CollapseProject inlined `norm` into the innermost lambda (every
    // window re-ran the regex over the whole document, interpreted) — it
    // hung the round-4 bench. Explode positions, hash per row (codegen'd,
    // linear), take the 4-row window min per doc, distinct. The whitespace
    // class is spelled out because Java's \s includes \x0B where RE2's
    // does not (ADVICE r4).
    // Repetition signals (the Gopher-style "repetitive document" filters):
    // per-token counts via ONE explode + two aggregations — top-token
    // frequency and duplicate-token fraction. The explode shuffle carries
    // (doc_id, token) and the reduce is map-side combined; repartition by
    // doc_id parallelizes the single-file scan's fan-out (see
    // dedup_simhash_md5's plan note).
    "text_repetition" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .repartition(col("doc_id"))
        .selectExpr("doc_id", s"EXPLODE($TokensExpr) AS t")
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("n"))
        .groupBy($"doc_id")
        .agg(sum($"n").as("n_tokens"), count(lit(1)).as("n_uniq_tokens"),
          max($"n").as("top_tok_n"))
        .selectExpr("doc_id", "n_tokens", "n_uniq_tokens", "top_tok_n",
          "CAST(top_tok_n AS DOUBLE) / n_tokens AS top_tok_ratio",
          "1.0 - CAST(n_uniq_tokens AS DOUBLE) / n_tokens AS dup_tok_ratio")
    }),

    // Gopher-style quality rules as one narrow map (no shuffle): token
    // count bounds, mean token length band, alphabetic-token ratio,
    // minimum stopword hits — plus the composite pass flag a corpus
    // filter would gate on.
    "text_gopher_rules" -> ((s, dir) => {
      Tables.documents(s, dir)
        .selectExpr("doc_id" +: GopherStatExprs: _*)
        .where("n_tokens >= 1")
        .selectExpr("doc_id", "n_tokens",
          "CAST(sum_tok_len AS DOUBLE) / n_tokens AS mean_tok_len",
          "CAST(n_alpha AS DOUBLE) / n_tokens AS alpha_ratio",
          s"${GopherRules(0)} AS r_count",
          s"${GopherRules(1)} AS r_meanlen",
          s"${GopherRules(2)} AS r_alpha",
          s"${GopherRules(3)} AS r_stop")
        .selectExpr("doc_id", "n_tokens", "mean_tok_len", "alpha_ratio",
          "r_count", "r_meanlen", "r_alpha", "r_stop",
          "r_count AND r_meanlen AND r_alpha AND r_stop AS passes")
    }),

    // C4-style line-level cleaning (Raffel et al. 2020 §2.2's heuristics):
    // keep a line only if it ends in terminal punctuation, has >= 5 words,
    // and doesn't mention javascript; drop the whole page when it has
    // < 3 surviving lines, contains "lorem ipsum", or a curly brace. The
    // raw pages are PLANTED around each doc (the punctuation-free corpus
    // text itself is the always-failing line; junk lines land on %3/%4
    // strata; two proper sentences always survive) so every rule fires on
    // any corpus and the oracle predicts each decision. Scale shape: ONE
    // narrow map — the line split, per-line rules, and cleaned-page
    // reassembly are all array HOFs inside whole-stage codegen; no
    // explode, no shuffle. md5(clean_text) pins exact reconstruction.
    "text_c4_rules" -> ((s, dir) => {
      Tables.documents(s, dir).selectExpr("doc_id",
        ("CONCAT_WS(CHR(10), text, " +
          "'The quick brown fox jumps over the lazy dog today.', " +
          "CASE WHEN doc_id % 3 = 0 THEN 'lorem ipsum dolor sit amet consectetur.' END, " +
          "CASE WHEN doc_id % 4 = 0 THEN 'enable javascript { var x } to view this site.' END, " +
          "'Too short.', " +
          "CONCAT('Document ', CAST(doc_id AS STRING), " +
          "' ends with a unique proper closing sentence.')) AS page"))
        .selectExpr("doc_id", "SPLIT(page, CHR(10)) AS lines", "page")
        .selectExpr("doc_id", "SIZE(lines) AS n_lines",
          "FILTER(lines, l -> l RLIKE '[.!?\"]$' " +
            "AND SIZE(SPLIT(l, ' ')) >= 5 " +
            "AND NOT CONTAINS(LOWER(l), 'javascript')) AS kept",
          "CONTAINS(LOWER(page), 'lorem ipsum') AS has_lorem",
          "CONTAINS(page, '{') AS has_brace")
        .selectExpr("doc_id", "n_lines", "SIZE(kept) AS n_kept",
          "has_lorem", "has_brace",
          "SIZE(kept) >= 3 AND NOT has_lorem AND NOT has_brace AS page_pass",
          "MD5(ARRAY_JOIN(kept, CHR(10))) AS clean_md5")
    }),

    // Hashed linear quality classifier — the fastText-shaped corpus
    // filter (CCNet/DCLM style): each token hashes into a weight-table
    // bucket, the doc score is the mean bucket weight, and a threshold
    // gates keep/drop. The weight table ships INSIDE the expression
    // (corpus-size-independent, like text_lm_score); here the weights are
    // a deterministic function of the MD5 bucket so DuckDB recomputes the
    // exact integers — a learned table would swap in via the same bucket
    // lookup without changing the plan. One narrow map, no shuffle: the
    // 100 TB shape of every quality-classifier sweep.
    // The TRAIN side of the hashed quality classifier: distributed
    // full-batch logistic regression over md5-bucket features
    // (graft.text.HashedLr), decision-xchecked the sim_semdedup way — the
    // corpus carries PLANTED separable labels (class phrase by doc_id
    // parity plus a unique noise token), so a correct trainer must reach
    // zero training error with O(1) margins and the oracle re-derives
    // label = prediction directly. Weights are float-sum order-sensitive
    // at the ulp level; decisions are not (HashedLr scaladoc).
    "text_lr_train_xcheck" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).selectExpr("doc_id",
        "doc_id % 2 = 0 AS y",
        "CASE WHEN doc_id % 2 = 0 " +
          "THEN CONCAT('alpha beta gamma alpha beta gamma alpha beta gamma noise', doc_id) " +
          "ELSE CONCAT('delta epsilon zeta delta epsilon zeta delta epsilon zeta noise', doc_id) " +
          "END AS text")
      // disjoint class vocabularies separate within a few steps; 10
      // iterations keeps margins O(1) without paying 40+ driver rounds
      val model = graft.text.HashedLr.train(docs, "doc_id", "text", "y",
        iterations = 10)
      graft.text.HashedLr.predict(docs, "doc_id", "text", model)
        .select($"did".as("doc_id"), $"predicted")
        .join(docs.select($"doc_id", $"y"), Seq("doc_id"))
        .select($"doc_id", $"y", $"predicted")
    }),

    "text_hash_classifier" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .selectExpr("doc_id", "graft_md5_bucket_score(text) AS sc")
        .where("sc IS NOT NULL")
        .selectExpr("doc_id", "sc.n_tokens AS n_tokens",
          "sc.raw_score AS raw_score",
          "CAST(sc.raw_score AS DOUBLE) / sc.n_tokens AS clf_score",
          "CAST(sc.raw_score AS DOUBLE) / sc.n_tokens > 0.0 AS keep")
    }),

    // Benchmark decontamination — the eval-leakage pass of a training
    // corpus build: documents sharing any 8-token gram with the benchmark
    // set (here: doc_id % 97 == 0 as the deterministic stand-in) are
    // flagged. Grams are built ROWS-FIRST (posexplode + lead window — the
    // winnowing lesson: a TRANSFORM-over-SEQUENCE lambda would inline the
    // tokenizer per element) and joined on their MD5 — an equi-join on a
    // 32-char key, never doc×doc, the shape that survives 100 TB with the
    // benchmark side broadcast.
    "text_decontaminate" -> ((s, dir) => {
      import s.implicits._
      // The fixture has no natural 8-gram overlap with the benchmark
      // subset, so contamination is PLANTED deterministically (the
      // text_redact_pii recipe): benchmark docs and every 9th doc carry
      // the same appended canary sentence, so every 9th doc must flag.
      val docs = Tables.documents(s, dir).selectExpr("doc_id",
        "CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0 " +
          s"THEN CONCAT(text, ' $DecontCanary') ELSE text END AS text")
      // Bench side built from the PRE-FILTERED docs (1% of the corpus) so
      // its index never pays the full-corpus gram pass.
      val grams = tokenGramIndex(docs, k = 8)
      val bench = tokenGramIndex(docs.filter($"doc_id" % 97 === 0), k = 8)
        .select($"doc_id".as("bench_id"), $"gram")
      val hits = grams.join(broadcast(bench), Seq("gram"))
        .filter($"doc_id" =!= $"bench_id")
        .groupBy($"doc_id")
        .agg(countDistinct($"gram").as("n_shared_grams"))
      docs.select($"doc_id")
        .join(hits, Seq("doc_id"), "left")
        .selectExpr("doc_id",
          "CAST(COALESCE(n_shared_grams, 0) AS BIGINT) AS n_shared_grams",
          "n_shared_grams IS NOT NULL AS contaminated")
    }),

    // The decontamination check against a PERSISTED benchmark-gram index
    // (text.DecontaminationIndex): same canary-planted corpus and the
    // same report as text_decontaminate, but the benchmark side comes
    // from a standing table built in two tagged ingests, compacted
    // through tag 1, with BOTH replay classes exercised — the archived
    // tag no-ops via the watermark, the recent tag re-appends duplicates
    // the DISTINCT-counting membership semantics absorb. The oracle is
    // the direct overlap recomputation: a fold, replay, or join bug
    // breaks the hash.
    "text_decont_standing" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "text_decont_standing")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).selectExpr("doc_id",
        "CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0 " +
          s"THEN CONCAT(text, ' $DecontCanary') ELSE text END AS text")
      val bench = docs.filter($"doc_id" % 97 === 0)
      val idx = new graft.text.DecontaminationIndex(s, p)
      idx.ingest(bench.filter($"doc_id" < 250), tag = 1L)
      idx.ingest(bench.filter($"doc_id" >= 250), tag = 2L)
      idx.compactThrough(1L)
      idx.ingest(bench.filter($"doc_id" < 250), tag = 1L) // archived: no-op
      idx.ingest(bench.filter($"doc_id" >= 250), tag = 2L) // recent: tolerated
      idx.check(docs)
    }),

    // The BATCH twin of EventStreams.curateStream, end-to-end on the
    // STANDING architecture: a decontamination index pre-loaded with the
    // benchmark slice, then two daily landings curated through
    // curateBatch (quality gate → decont gate → standing-dedup check →
    // curated partition write → index ingest). The oracle recomputes the
    // WHOLE composition: keep a doc iff it passes quality, shares no
    // 8-gram with a benchmark doc (self excluded), and no EARLIER-batch
    // surviving doc has identical text (check-then-ingest first-wins —
    // within-batch dups both survive, a semantics difference from the
    // global-min dedup the oracle must reproduce exactly).
    "pipeline_curate_standing" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "pipeline_curate_standing")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).selectExpr("doc_id",
        "CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0 " +
          s"THEN CONCAT(text, ' $DecontCanary') ELSE text END AS text")
      new graft.text.DecontaminationIndex(s, s"$p/decont")
        .ingest(docs.filter($"doc_id" % 97 === 0), tag = 1L)
      val quality = expr(s"SIZE($TokensExpr) >= 5")
      val curated = s"$p/curated"
      graft.streaming.EventStreams.curateBatch(
        docs.filter($"doc_id" < 250), 0L, s"$p/dedup", curated,
        md5LshBands, quality, Some(s"$p/decont"))
      graft.streaming.EventStreams.curateBatch(
        docs.filter($"doc_id" >= 250), 1L, s"$p/dedup", curated,
        md5LshBands, quality, Some(s"$p/decont"))
      s.read.parquet(curated)
        .selectExpr("doc_id", "CAST(ingest_batch_id AS BIGINT) AS ingest_batch_id")
    }),

    // Stratified quota sampling: an exact, reproducible per-stratum quota
    // (20 docs per lang) ordered by content hash — the "balanced subset"
    // op. Window per stratum: partition count = |strata|, each tiny; the
    // unbounded-stratum scale path is the hash-rate variant below.
    "sample_stratified_quota" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      Tables.documents(s, dir)
        .selectExpr("doc_id", "lang", "MD5(text) AS h")
        .withColumn("rn", row_number().over(w))
        .where($"rn" <= 20)
        .select($"doc_id", $"lang", $"rn")
    }),

    // Weighted source mixing: per-stratum sampling RATES (the data-mixing
    // step that rebalances sources before training) as one shuffle-free
    // narrow map — content-hash thresholding, reproducible across engines
    // and runs, no quota coordination. The 100 TB-scale form of sampling.
    "sample_mix_weighted" -> ((s, dir) => {
      // rates from MixCase: ~25% en, ~50% de, ~75% rest
      Tables.documents(s, dir)
        .where("SUBSTRING(MD5(CONCAT(CAST(doc_id AS STRING), ':', lang)), " +
          s"1, 2) < $MixCase")
        .selectExpr("doc_id", "lang")
    }),

    // Deterministic training-order shuffle + sharding
    // ([[graft.operators.ShardShuffle]]): seed-keyed md5 decides shard
    // membership AND within-shard order, reproducible across engines and
    // re-runs. No global total order — one window task per shard, with
    // nShards as the parallelism/file-size knob (see the operator
    // scaladoc for the 100 TB layout argument).
    "shard_shuffle" -> ((s, dir) =>
      graft.operators.ShardShuffle.assign(
        Tables.documents(s, dir).select("doc_id"), "doc_id", nShards = 16)),

    // CURRICULUM ordering: band documents by a quality heuristic (token
    // count here; any score column slots in), then lay each band out in
    // shard_shuffle's deterministic pseudo-random shard order — training
    // reads bands easy→hard (or the reverse) while I/O stays shard-
    // parallel. No global total order: every window is partitioned by
    // (band, shard), the ShardShuffle scale argument verbatim.
    "sample_curriculum_order" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .selectExpr("doc_id", s"SIZE(${Q.TokensExpr}) AS n_tokens")
        .selectExpr("doc_id",
          "CASE WHEN n_tokens >= 60 THEN 0 WHEN n_tokens >= 30 THEN 1 ELSE 2 END AS band",
          "md5(CONCAT('graft-curr:42:', CAST(doc_id AS STRING))) AS h")
        .withColumn("shard_id",
          expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT) % 4"))
        .withColumn("pos_in_shard", row_number().over(
          Window.partitionBy($"band", $"shard_id").orderBy($"h", $"doc_id")))
        .selectExpr("doc_id", "band", "shard_id",
          "CAST(pos_in_shard AS BIGINT) AS pos_in_shard")
    }),

    // The WHOLE curation funnel composed into one declarative plan —
    // what a user actually runs to build a training set: Gopher quality
    // gate → exact dedup (keep-lowest-id per identical text) → benchmark
    // decontamination (8-gram MD5 equi-join, bench side broadcast, bench
    // members excluded) → per-source weighted mixing → deterministic
    // shard layout. Every stage is md5/SQL-decidable, so the END-TO-END
    // composition is oracle-checked: a wrong decision at ANY stage
    // changes the surviving population and therefore every downstream
    // shard position. The stage DECISION constants are shared with the
    // standalone queries — Gopher thresholds via [[GopherRules]], mix
    // rates via [[MixCase]], gram construction via [[tokenGramIndex]],
    // layout via [[graft.operators.ShardShuffle]] — so the funnel and
    // the per-stage queries cannot drift on any decision.
    "pipeline_llm_curate" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // canary planting: same recipe as text_decontaminate, applied ONCE
      // so every stage sees one consistent text column
      val docs = Tables.documents(s, dir).selectExpr("doc_id", "lang",
        "CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0 " +
          s"THEN CONCAT(text, ' $DecontCanary') ELSE text END AS text")
      val quality = docs
        .selectExpr(Seq("doc_id", "lang", "text") ++ GopherStatExprs: _*)
        .where(GopherPass)
        .select($"doc_id", $"lang", $"text")
      val deduped = quality
        .withColumn("__mn", min($"doc_id").over(Window.partitionBy(md5($"text"))))
        .where($"doc_id" === $"__mn").drop("__mn")
      val bench = tokenGramIndex(docs.filter($"doc_id" % 97 === 0), k = 8)
        .select($"doc_id".as("bench_id"), $"gram")
      val contaminated = tokenGramIndex(deduped.select($"doc_id", $"text"), k = 8)
        .join(broadcast(bench), Seq("gram"))
        .filter($"doc_id" =!= $"bench_id")
        .select($"doc_id").distinct()
      val clean = deduped
        .join(contaminated, Seq("doc_id"), "left_anti")
        .filter($"doc_id" % 97 =!= 0) // bench members never train
      val mixed = clean.where(
        "SUBSTRING(MD5(CONCAT(CAST(doc_id AS STRING), ':', lang)), 1, 2) < " +
          MixCase)
      graft.operators.ShardShuffle
        .assign(mixed.select("doc_id", "lang"), "doc_id", nShards = 16)
        .select("doc_id", "lang", "shard_id", "pos_in_shard")
    }),

    "text_winnow_md5" -> ((s, dir) => md5WinnowIndex(s, dir, bound = 100)),

    // Winnowing inverted-index candidate pairs over the MD5 fingerprint
    // set — the candidate-retrieval join at scale (equi-join on fp, never
    // doc×doc), sharing [[md5WinnowIndex]] with text_winnow_md5 so the
    // oracle proves BOTH the fingerprint construction and the pair
    // semantics cross-engine (the xxhash64 fast path keeps the same shape
    // in graft.dedup.Winnowing.candidatePairs, spec-proven).
    "text_winnow_pairs" -> ((s, dir) => {
      import s.implicits._
      val idx = md5WinnowIndex(s, dir, bound = 200)
      val a = idx.select($"doc_id".as("id_a"), $"fp")
      val b = idx.select($"doc_id".as("id_b"), $"fp")
      a.join(b, Seq("fp"))
        .filter($"id_a" < $"id_b")
        .groupBy($"id_a", $"id_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 3)
    }),

    // Epoch-weighted upsampling: mixture weights > 1 replicate a source
    // across training epochs (en=2.5, de=1.25, else 1.0). Integer part
    // explodes to epochs 1..floor(w); the fractional epoch is gated per
    // doc by a content-hash threshold — sample_mix_weighted's reproducible
    // -rate trick applied to w > 1. One narrow map + explode, no shuffle,
    // no quota coordination: the 100 TB-scale form of upsampling.
    "sample_upsample_epochs" -> ((s, dir) => {
      Tables.documents(s, dir)
        .selectExpr("doc_id", "lang", s"$EpochBase AS base",
          "CASE WHEN SUBSTRING(MD5(CONCAT('ep:', CAST(doc_id AS STRING), " +
            s"':', lang)), 1, 2) < $EpochFracHex THEN 1 ELSE 0 END AS extra")
        .selectExpr("doc_id", "lang",
          "EXPLODE(SEQUENCE(1, base + extra)) AS epoch")
    }),

    // The BPE trainer's first pass: adjacent symbol-pair frequencies over
    // the word-frequency table (symbols = characters at iteration zero).
    // The corpus collapses to its distinct-word vocabulary (map-side-
    // combined count) BEFORE the character-pair fan-out, so the explode
    // runs over the vocabulary, not the corpus — at 100 TB the vocabulary
    // is MBs while the corpus is TBs. Top-50 by (count DESC, pair ASC):
    // a total order, so the result multiset is engine-independent.
    "text_bpe_pair_freq" -> ((s, dir) => {
      import s.implicits._
      val wordFreq = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE($BpeTokens) AS word")
        .where("LENGTH(word) >= 2")
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      wordFreq
        .selectExpr("freq",
          "EXPLODE(TRANSFORM(SEQUENCE(1, LENGTH(word) - 1), " +
            "i -> SUBSTRING(word, i, 2))) AS pair")
        .groupBy($"pair").agg(sum($"freq").as("n_occurrences"))
        .orderBy($"n_occurrences".desc, $"pair".asc)
        .limit(50)
    }),

    // Full BPE merge-training loop (round-8 verdict #4): iterate
    // pair-count → merge → re-segment via [[graft.text.BpeTrainer]]. The
    // real training surface over the whole ≥2-char vocabulary — merges
    // interact (a merged symbol joins later pair counts), which no
    // single SQL pass can express, so this row is rows-only; its
    // decision-level oracle is `text_bpe_train_xcheck` below, and
    // BpeTrainerSpec pins the interacting-merge semantics on a
    // hand-computed corpus.
    "text_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val wordFreq = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE($BpeTokens) AS word")
        .where("LENGTH(word) >= 2")
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      graft.text.BpeTrainer.trainDf(wordFreq, 20)
    }),

    // Decision-level oracle for the training loop: on the LENGTH=2 word
    // slice a merge collapses its word type to one symbol and removes it
    // from every later round without creating new pairs (no interaction),
    // so the trained merge list provably equals the top-k initial pairs
    // by (count DESC, pair ASC) — one SQL window. The full iterative
    // machinery (per-round count, argmax, merge application, working-set
    // shrink) still runs on the Spark side; only the EXPECTATION
    // simplifies.
    "text_bpe_train_xcheck" -> ((s, dir) => {
      import s.implicits._
      val wordFreq = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE($BpeTokens) AS word")
        .where("LENGTH(word) = 2")
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      graft.text.BpeTrainer.trainDf(wordFreq, 12)
    }),

    // ENCODE side of the tokenizer, decision-oracled on the same
    // non-interacting LENGTH=2 slice: after training 12 merges there, a
    // word encodes to ONE symbol iff it is a trained merge, else to its
    // two characters — derivable in SQL with a top-12 window + left
    // join, while the Spark side runs the real rank-ordered greedy
    // passes. Interacting encode chains (u+g → h+ug → hug+s) are pinned
    // by BpeTrainerSpec.
    "text_bpe_encode_xcheck" -> ((s, dir) => {
      import s.implicits._
      val wordFreq = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE($BpeTokens) AS word")
        .where("LENGTH(word) = 2")
        .groupBy($"word").agg(count(lit(1)).as("freq"))
      val merges = graft.text.BpeTrainer.train(wordFreq, 12)
      graft.text.BpeTrainer.encode(wordFreq.select($"word"), merges)
        .selectExpr("word", "SIZE(syms) AS n_syms",
          "CONCAT_WS(' ', syms) AS encoded")
    }),

    // TF-IDF keyword extraction: per-document top-3 lowercased terms by
    // tf·ln(N/df). Both the ranking and the emitted score use integer
    // micro-units (text_lm_score recipe) so the engines' last-ulp ln()
    // differences cannot flip a rank or a hash. Shapes: tf and df are
    // two hash aggs, the tf⋈df join keys on term (df is vocabulary-
    // sized — AQE broadcasts it when it fits), N is a scalar subquery
    // (one column-less count job, no cross join), and top-3 is a window
    // partitioned per doc — |docs| partitions of a few terms each.
    "text_tfidf_topk" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("tfidf_docs")
      s.sql(s"""
        |WITH t AS (
        |  SELECT doc_id, LOWER(tok) AS term
        |  FROM tfidf_docs LATERAL VIEW EXPLODE($TokensExpr) x AS tok),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(ROUND(tf.tf * LN(
        |      CAST((SELECT COUNT(*) FROM tfidf_docs) AS DOUBLE) / df.df)
        |      * 1000000) AS BIGINT) AS tfidf_micro
        |  FROM tf JOIN df ON tf.term = df.term)
        |SELECT doc_id, term, tf, tfidf_micro, rn FROM (
        |  SELECT sc.*, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf_micro DESC, term) AS rn
        |  FROM sc)
        |WHERE rn <= 3""".stripMargin)
    }),

    // Cross-document repeated-span detection — the substring-dedup pass
    // of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    // Models Better") re-expressed in Spark's vocabulary: instead of a
    // suffix array, a positional 8-token-gram index. A position is
    // covered when its gram occurs in >= 2 DISTINCT docs; covered
    // positions merge into maximal per-doc spans via gaps-and-islands.
    // Runs on [[plantedCorpus]] so the (k, k+1) identical pairs are
    // ground-truth full-coverage spans. Scale shapes: ONE gram fan-out
    // (the cross-doc test is a window min/max-per-gram — min(doc)!=
    // max(doc) iff >= 2 distinct docs — not a groupBy+self-join that
    // would re-expand the gram subtree per side); then one shuffle back
    // to doc_id for the islands window. Index rows are (id, pos, 32-char
    // md5) — the corpus text itself never shuffles.
    "dedup_span_runs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val W = 8
      // toks materializes BEFORE the position explode (Generate carries
      // the array per doc); slicing per position is O(W), the tokenizer
      // runs once per doc — the CollapseProject-inlining lesson.
      val grams = plantedCorpus(Tables.documents(s, dir))
        .repartition(col("doc_id"))
        .selectExpr("doc_id", s"$TokensExpr AS toks")
        .where(s"SIZE(toks) >= $W")
        .selectExpr("doc_id", "toks",
          s"EXPLODE(SEQUENCE(1, SIZE(toks) - ${W - 1})) AS i")
        .selectExpr("doc_id", "i",
          s"MD5(ARRAY_JOIN(SLICE(toks, i, $W), ' ')) AS gram")
      val perGram = Window.partitionBy($"gram")
      val perDoc = Window.partitionBy($"doc_id").orderBy($"i")
      grams
        .withColumn("mn", min($"doc_id").over(perGram))
        .withColumn("mx", max($"doc_id").over(perGram))
        .where($"mn" =!= $"mx")
        .select($"doc_id", $"i")
        .withColumn("prev", lag($"i", 1).over(perDoc))
        .withColumn("brk",
          when($"prev".isNull || $"i" =!= $"prev" + 1, 1).otherwise(0))
        .withColumn("run", sum($"brk").over(perDoc))
        .groupBy($"doc_id", $"run")
        .agg(min($"i").as("span_start"),
          (max($"i") + lit(W - 1)).as("span_end"),
          count(lit(1)).as("n_dup_grams"))
        .select($"doc_id", $"span_start", $"span_end", $"n_dup_grams")
    }),

    // Vocabulary coverage curve — what fraction of corpus tokens survives
    // truncating the vocabulary at min-frequency f? Deliberately framed
    // as FREQUENCY-THRESHOLD truncation, not top-K: top-K needs a global
    // order over the vocabulary (the single-partition window PlanLint
    // forbids), while thresholding is one map-side-combined term count
    // followed by one conditional agg — the formulation that holds at a
    // 100 TB corpus (vocabulary is MBs after the first combine). The
    // coverage ratio is emitted in micro-units over an all-BIGINT
    // numerator/denominator: ROUND(covered * 1e6 / total) is two
    // correctly-rounded IEEE ops, identical across engines.
    "text_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val tf = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE($TokensExpr) AS tok")
        .selectExpr("LOWER(tok) AS term")
        .groupBy($"term").agg(count(lit(1)).as("freq"))
      val cases = VocabMinFreqs.flatMap(f => Seq(
        s"SUM(CASE WHEN freq >= $f THEN freq ELSE 0 END) AS cov_$f",
        s"SUM(CASE WHEN freq >= $f THEN 1 ELSE 0 END) AS terms_$f"))
      val stacked = VocabMinFreqs
        .map(f => s"$f, terms_$f, cov_$f").mkString(", ")
      tf.selectExpr(cases :+ "SUM(freq) AS total": _*)
        .selectExpr("total",
          s"STACK(${VocabMinFreqs.size}, $stacked) AS (min_freq, n_terms, covered_tokens)")
        .selectExpr("min_freq", "n_terms", "covered_tokens", "total AS total_tokens",
          "CAST(ROUND(covered_tokens * 1000000.0 / total) AS BIGINT) AS coverage_micro")
    }),

    // Temperature-based source mixing (the multilingual-sampling rule of
    // XLM-R: p_i ~ n_i^alpha, alpha = 0.7, flattening skewed source
    // sizes). Engine-hash safety via the text_lm_score recipe: POW is
    // transcendental, so each source's n^alpha is micro-rounded to a
    // BIGINT FIRST (per-row, order-free); the normalizing denominator is
    // then an INTEGER sum — deterministic under any aggregation order —
    // and the final weight is two correctly-rounded IEEE ops. The group
    // count is map-side combined; the result is |sources| rows.
    // Global segment-level dedup (C4's "discard repeated spans" rule at
    // sentence-segment granularity): every DISTINCT segment survives only
    // at its globally FIRST occurrence — lowest doc_id, then lowest
    // position — whether the repeat is cross-document (planted (k, k+1)
    // doc pairs; the corpus-wide suffix) or within-document. Differs from
    // text_boilerplate (frequency-threshold removal: a segment in >= 50%
    // of docs vanishes EVERYWHERE) — here every segment is kept exactly
    // once, corpus-wide. Shapes: one explode fan-out, ONE shuffle on seg
    // feeding two stacked same-partition windows (min doc, then min pos
    // within that doc — no min-by-struct, which DuckDB cannot mirror),
    // then the per-doc reassembly agg. Segment rows shuffle once; at
    // 100 TB the seg key could be its md5 to bound shuffle width.
    "dedup_paragraph_global" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val segs = plantedCorpus(Tables.documents(s, dir))
        .selectExpr("doc_id", s"CONCAT(text, '$ParaSuffix') AS raw")
        .repartition(col("doc_id"))
        .selectExpr("doc_id", "POSEXPLODE(SPLIT(raw, '[.][ ]')) AS (pos, seg0)")
        .selectExpr("doc_id", "pos", "TRIM(seg0) AS seg")
        .where("seg != ''")
      val perSeg = Window.partitionBy($"seg")
      segs
        .withColumn("mn_doc", min($"doc_id").over(perSeg))
        .withColumn("keep", $"doc_id" === $"mn_doc" &&
          $"pos" === min(when($"doc_id" === $"mn_doc", $"pos")).over(perSeg))
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_segments"),
          sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(CASE WHEN keep " +
              "THEN named_struct('pos', pos, 'seg', seg) END)), x -> x.seg)"),
            ". ").as("clean_text"))
    }),

    // BM25 retrieval (Robertson; Lucene idf variant) for a fixed query
    // term set. Scale shapes: the tokenizer runs ONCE per doc inside a
    // narrow map that emits (dl, hits) — document length plus the
    // FILTERed query-term matches — so Generate explodes only matching
    // tokens, never the corpus token stream; df and the (n_docs, sum_dl)
    // scalars reduce to <= |terms| + 1 rows and come back as broadcasts;
    // only the candidate docs (>= 1 hit) reach the scoring aggregation.
    // Global top-10 via orderBy+limit = TakeOrderedAndProject (per-
    // partition heaps, no global sort), total-ordered by (score, doc_id).
    "text_bm25_topk" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("bm25_docs")
      // (n_docs, sum_dl) attach as SCALAR SUBQUERIES — one broadcastable
      // row each, no join operator at all (a crossJoin / constant-key
      // join both plan as BroadcastNestedLoopJoin once Catalyst folds
      // the key; the mix_temperature precedent)
      s.sql(s"""
        |WITH base AS (
        |  SELECT doc_id, SIZE(toks) AS dl,
        |         FILTER(TRANSFORM(toks, t -> LOWER(t)),
        |                t -> t IN (${inList(Bm25Terms)})) AS hits
        |  FROM (SELECT doc_id, $TokensExpr AS toks FROM bm25_docs)),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, EXPLODE(hits) AS term
        |        FROM base WHERE SIZE(hits) > 0)
        |  GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, $Bm25ContribExpr AS cm FROM (
        |    SELECT tf.doc_id, tf.tf, tf.dl, dfx.df,
        |           (SELECT n_docs FROM stats) AS n_docs,
        |           (SELECT sum_dl FROM stats) AS sum_dl
        |    FROM tf JOIN dfx ON tf.term = dfx.term))
        |SELECT doc_id, SUM(cm) AS score_micro
        |FROM sc GROUP BY 1
        |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin)
    }),

    // Standing BM25 inverted index (text.StandingBm25Index): the corpus
    // is tokenized ONCE into a persisted postings table partitioned by
    // (batch_tag, term_bucket) plus an O(tags) totals table, and the
    // query probes only its terms' hash-bucket directories — retrieval
    // becomes O(query), not O(corpus). The catalog entry builds the
    // index from two batches, REPLAYS the second tag (counts are not
    // duplicate-tolerant, so a replay that re-appended would double tf
    // and df and break the hash), then queries the shared term set —
    // and the oracle is the DIRECT BM25 formula over the documents
    // table: standing path ≡ direct computation, hash-checked.
    "text_standing_bm25" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "text_standing_bm25")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      val idx = new graft.text.StandingBm25Index(s, p)
      idx.ingest(docs.filter($"doc_id" < 250), tag = 1L)
      idx.ingest(docs.filter($"doc_id" >= 250), tag = 2L)
      idx.ingest(docs.filter($"doc_id" >= 250), tag = 2L) // replay: strict no-op
      idx.query(Bm25Terms, k = 10)
    }),

    // Compaction invisibility for the BM25 index (the dedup_index_compacted
    // recipe, but counts-sensitive): build three tags, fold tags ≤ 2 into
    // the archive partition via the atomic-overwrite fold, replay an
    // ARCHIVED tag (must no-op via the watermark — its stats row is gone,
    // so a probe-only ingest would re-append and double tf/df) and a
    // recent tag (no-ops via the stats probe), then query. The oracle is
    // the direct BM25 formula — any fold double-count or lost row breaks
    // the hash.
    "text_standing_bm25_compacted" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "text_standing_bm25_compacted")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      val idx = new graft.text.StandingBm25Index(s, p)
      idx.ingest(docs.filter($"doc_id" < 150), tag = 1L)
      idx.ingest(docs.filter($"doc_id" >= 150 && $"doc_id" < 300), tag = 2L)
      idx.ingest(docs.filter($"doc_id" >= 300), tag = 3L)
      idx.compactThrough(2L)
      idx.ingest(docs.filter($"doc_id" < 150), tag = 1L) // archived replay: watermark no-op
      idx.ingest(docs.filter($"doc_id" >= 300), tag = 3L) // recent replay: probe no-op
      idx.query(Bm25Terms, k = 10)
    }),

    // RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001 lineage):
    // run BM25 for the seed terms, take the top-10 feedback docs, mine
    // the 5 most frequent non-seed non-stopword terms from them, and
    // re-score the corpus with the EXPANDED term set — query expansion,
    // the classic recall lever sparse retrieval adds on top of exact
    // term match. Scale shapes: this variant explodes the full token
    // stream once (tf over (doc, term) — the dynamic expansion set can't
    // be a static pushdown filter like text_bm25_topk's), the same cost
    // class as text_tfidf_topk; both scoring passes then join tf against
    // ≤ 8-row term sets (broadcast), df/totals reduce to tiny aggregates,
    // and each top-k is TakeOrderedAndProject. Contributions micro-round
    // before every sum; expansion ties break (freq DESC, term ASC) —
    // deterministic end-to-end, hash-oracled including the mined terms.
    "text_bm25_rm3" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("rm3_docs")
      s.sql(s"""
        |WITH doclen AS (
        |  SELECT doc_id, SIZE(TRANSFORM($TokensExpr, t -> LOWER(t))) AS dl
        |  FROM rm3_docs),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM doclen),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
        |    SELECT d.doc_id, l.dl, EXPLODE(TRANSFORM($TokensExpr,
        |      t -> LOWER(t))) AS term
        |    FROM rm3_docs d JOIN doclen l ON d.doc_id = l.doc_id)
        |  GROUP BY 1, 2, 3),
        |tf1 AS (SELECT * FROM tf WHERE term IN (${inList(Bm25Terms)})),
        |df1 AS (SELECT term, COUNT(*) AS df FROM tf1 GROUP BY 1),
        |sc1 AS (
        |  SELECT doc_id, $Bm25ContribExpr AS cm FROM (
        |    SELECT tf1.doc_id, tf1.tf, tf1.dl, df1.df,
        |           (SELECT n_docs FROM stats) AS n_docs,
        |           (SELECT sum_dl FROM stats) AS sum_dl
        |    FROM tf1 JOIN df1 ON tf1.term = df1.term)),
        |fb AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, SUM(cm) AS score FROM sc1 GROUP BY 1
        |    ORDER BY score DESC, doc_id LIMIT 10)),
        |exp AS (
        |  SELECT term FROM (
        |    SELECT tf.term, SUM(tf.tf) AS freq
        |    FROM tf JOIN fb ON tf.doc_id = fb.doc_id
        |    WHERE tf.term NOT IN (${inList(Bm25Terms)})
        |      AND tf.term NOT IN (${inList(Stopwords)})
        |    GROUP BY 1 ORDER BY freq DESC, term LIMIT 5)),
        |allterms AS (
        |  SELECT term FROM exp
        |  UNION ALL SELECT * FROM VALUES ${Bm25Terms.map(t => s"('$t')").mkString(", ")}),
        |tf3 AS (SELECT tf.* FROM tf JOIN allterms ON tf.term = allterms.term),
        |df3 AS (SELECT term, COUNT(*) AS df FROM tf3 GROUP BY 1),
        |sc3 AS (
        |  SELECT doc_id, $Bm25ContribExpr AS cm FROM (
        |    SELECT tf3.doc_id, tf3.tf, tf3.dl, df3.df,
        |           (SELECT n_docs FROM stats) AS n_docs,
        |           (SELECT sum_dl FROM stats) AS sum_dl
        |    FROM tf3 JOIN df3 ON tf3.term = df3.term))
        |SELECT doc_id, SUM(cm) AS score_micro
        |FROM sc3 GROUP BY 1
        |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin)
    }),

    // The standing BM25 index through the SQL surface: same build as
    // text_standing_bm25 (two ingests + a replayed tag), but the query
    // is the parser-extension statement `SEARCH BM25 INDEX '<path>' FOR
    // (…) LIMIT 10` — a SQL user needs no Scala API to search the
    // index. Same direct-formula oracle: the statement must reproduce
    // the from-scratch computation hash-for-hash.
    "text_sql_bm25_search" -> ((s, dir) => {
      import s.implicits._
      val p = Q.scratch(dir, "text_sql_bm25_search")
      Q.deleteDir(s, p)
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      val idx = new graft.text.StandingBm25Index(s, p)
      idx.ingest(docs.filter($"doc_id" < 250), tag = 1L)
      idx.ingest(docs.filter($"doc_id" >= 250), tag = 2L)
      idx.ingest(docs.filter($"doc_id" >= 250), tag = 2L) // replay: no-op
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s.sql(s"SEARCH BM25 INDEX '$p' FOR ($termList) LIMIT 10")
    }),

    // DSIR (Xie et al. 2023, "Data Selection for Language Models via
    // Importance Resampling") re-expressed Spark-first: hashed-bigram
    // features (256 buckets = first md5 byte as 2 hex chars), target
    // distribution estimated from the lang='en' slice, raw distribution
    // from the whole corpus; per-doc importance weight = sum over bigram
    // instances of log(p_target(bucket) / p_raw(bucket)), add-0.5
    // smoothed. Scale shapes: ONE bigram fan-out of 2-hex-char bucket
    // keys (the text itself never shuffles; the md5 runs inside the same
    // projection); BOTH distributions reduce in one 256-row aggregation
    // (raw = count, target = conditional sum — no second pass, no
    // left-join null-fill) broadcast back onto the bigram stream; the
    // per-doc sum is the only corpus-wide shuffle. Contributions are
    // micro-rounded before the integer sum — order-independent.
    "sample_dsir_weights" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("dsir_docs")
      // totals attach as scalar subqueries (see text_bm25_topk); the
      // REPARTITION hint spreads the bigram fan-out of the single-file
      // fixture across cores
      s.sql(s"""
        |WITH bi AS (
        |  SELECT /*+ REPARTITION(doc_id) */ doc_id, lang,
        |         SUBSTRING(MD5(CONCAT(toks[i - 1], ' ', toks[i])), 1, 2) AS bucket
        |  FROM (
        |    SELECT doc_id, lang, toks,
        |           EXPLODE(SEQUENCE(1, SIZE(toks) - 1)) AS i
        |    FROM (SELECT doc_id, lang,
        |            TRANSFORM($TokensExpr, t -> LOWER(t)) AS toks
        |          FROM dsir_docs)
        |    WHERE SIZE(toks) >= 2)),
        |b AS (SELECT bucket, COUNT(*) AS cr,
        |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |      FROM bi GROUP BY 1),
        |t AS (SELECT COUNT(*) AS t_r,
        |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_t
        |      FROM bi)
        |SELECT doc_id, COUNT(*) AS n_bigrams, SUM(cm) AS dsir_micro
        |FROM (
        |  SELECT doc_id, $DsirContribExpr AS cm FROM (
        |    SELECT bi.doc_id, b.cr, b.ct,
        |           (SELECT t_r FROM t) AS t_r,
        |           (SELECT t_t FROM t) AS t_t
        |    FROM bi JOIN b ON bi.bucket = b.bucket))
        |GROUP BY 1""".stripMargin)
    }),

    // Per-document unigram entropy — the information-theoretic quality
    // signal (low entropy = repetitive/templated text; complements the
    // Gopher repetition ratios, which count surface repeats). Scale
    // shapes: doc length n rides through the explode from the SAME
    // narrow map that tokenizes (no join back to the corpus); one
    // (doc, term) aggregation then one per-doc sum. Contributions are
    // nano-rounded before the integer sum — order-independent.
    "text_entropy" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("ent_docs")
      s.sql(s"""
        |WITH t AS (
        |  SELECT doc_id, n, term, COUNT(*) AS c
        |  FROM (
        |    SELECT doc_id, SIZE(toks) AS n, EXPLODE(toks) AS term
        |    FROM (SELECT doc_id, TRANSFORM($TokensExpr, t -> LOWER(t)) AS toks
        |          FROM ent_docs)
        |    WHERE SIZE(toks) >= 1)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |       COUNT(*) AS n_distinct,
        |       SUM($EntropyContribExpr) AS entropy_nano
        |FROM t GROUP BY 1, 2""".stripMargin)
    }),

    // Per-source KL divergence from the corpus unigram distribution —
    // the data-mixing diagnostic (a source whose language diverges from
    // the mixture shifts the trained model; KL quantifies how much).
    // Scale shapes: one token fan-out; (source, term) counts reduce to
    // |sources|·|vocab| rows; the corpus term table (|vocab|) and
    // per-source totals (|sources|) come back as broadcasts; the corpus
    // total is a scalar subquery. Nano-rounded contributions, integer
    // sums.
    "lang_kl_divergence" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("kl_docs")
      s.sql(s"""
        |WITH tok AS (
        |  SELECT source, term FROM (
        |    SELECT source, EXPLODE(TRANSFORM($TokensExpr, t -> LOWER(t))) AS term
        |    FROM kl_docs)),
        |st AS (SELECT source, term, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
        |ct AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1),
        |ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1)
        |SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
        |       SUM(cm) AS kl_nano
        |FROM (
        |  SELECT source, n_s, $KlContribExpr AS cm FROM (
        |    SELECT st.source, st.term, st.c_st, ct.c_t, ns.n_s,
        |           (SELECT SUM(c_st) FROM st) AS n_tot
        |    FROM st JOIN ct ON st.term = ct.term
        |            JOIN ns ON st.source = ns.source))
        |GROUP BY 1, 2""".stripMargin)
    }),

    // Zipf's-law slope of the corpus rank-frequency curve (natural text
    // sits near −1; synthetic/templated corpora flatten) — the
    // corpus-statistics audit a curation pipeline runs per snapshot.
    // The global rank over the REDUCED vocabulary avoids the
    // single-partition window PlanLint forbids: per-frequency offsets
    // (= count of strictly-more-frequent terms) come from a distributed
    // [[PrefixSum]] over the frequency histogram — distinct frequency
    // values are O(√total_tokens) since frequencies f₁>f₂>…>f_k sum to
    // ≥ k(k+1)/2, and PrefixSum's only driver traffic is its
    // |buckets|-row totals (round-8 verdict asked the histogram
    // `.collect()` this replaced to go) — and the rank within a
    // frequency is an ordinary PARTITION BY freq window. Equal to
    // ROW_NUMBER() OVER (ORDER BY freq DESC, term), which the oracle
    // uses directly. Regression sums are exact integers over
    // milli-rounded (ln rank, ln freq); only the final slope divides in
    // double.
    "text_zipf_slope" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val tf = Tables.documents(s, dir)
        .selectExpr(s"EXPLODE(TRANSFORM($TokensExpr, t -> LOWER(t))) AS term")
        .groupBy($"term").agg(count(lit(1)).as("freq"))
      // order key −freq: ascending PrefixSum order = descending frequency;
      // freq is unique post-groupBy, so the total order is well-defined
      val freqCounts = tf.groupBy($"freq").agg(count(lit(1)).as("cnt"))
        .withColumn("negf", -$"freq")
      val offDf = graft.operators.PrefixSum
        .runningTotal(freqCounts, "negf", "cnt", "cum")
        .select($"freq", ($"cum" - $"cnt").as("off"))
      val wf = Window.partitionBy($"freq").orderBy($"term")
      tf.join(broadcast(offDf), Seq("freq"))
        .withColumn("rank", $"off" + row_number().over(wf))
        .selectExpr(
          "CAST(ROUND(LN(rank) * 1000) AS BIGINT) AS xm",
          "CAST(ROUND(LN(freq) * 1000) AS BIGINT) AS ym")
        .agg(count(lit(1)).as("n"), sum($"xm").as("s1"), sum($"ym").as("s2"),
          sum($"xm" * $"xm").as("s11"), sum($"xm" * $"ym").as("s12"))
        .selectExpr("n AS n_terms", s"$ZipfSlopeExpr AS slope_micro")
    }),

    "sample_mix_temperature" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .selectExpr("source", "n_docs",
          s"CAST(ROUND(POWER(n_docs, $MixAlpha) * 1000000) AS BIGINT) AS pow_micro")
        .createOrReplaceTempView("mix_pow")
      // scalar subquery, not SUM() OVER (): the unpartitioned window
      // would single-partition the (already tiny) set AND trip PlanLint;
      // the subquery is one scalar broadcast
      s.sql("""SELECT source, n_docs, pow_micro,
        |  CAST(ROUND(pow_micro * 1000000.0 /
        |    (SELECT SUM(pow_micro) FROM mix_pow)) AS BIGINT) AS weight_micro
        |FROM mix_pow""".stripMargin)
    })
  )

  /** 8-token canary appended to benchmark + every-9th docs so the
    * decontamination hit path is deterministically exercised (and shared
    * verbatim with the oracle SQL).
    */
  private[graft] val DecontCanary = "leak marker alpha beta gamma delta epsilon zeta"

  /** Distinct (doc_id, gram-MD5) index of k-token grams via the native
    * one-pass [[graft.functions.TokenGramHashes]] kernel (tokenize, slide,
    * hash, dedupe inside the expression): a narrow map + explode of the
    * already-reduced per-doc hash set — no posexplode fan-out, no per-doc
    * sort, no window exec, no distinct shuffle. Bit-parity with the
    * declarative lead-window construction is pinned in TokenGramSpec.
    */
  private def tokenGramIndex(docs: DataFrame, k: Int) = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs
      // single-file source: spread the gram fan-out (cf. text_winnow_md5)
      .repartition(col("doc_id"))
      .selectExpr("doc_id", s"EXPLODE(graft_token_grams(text, $k)) AS gram")
  }

  /** Oracle-able LSH band keys (doc_id, band_idx, band_key): 2 bands of 2
    * MD5-minhashes each, band key = MD5 of the concatenated band — shared
    * by the band-index query and incremental dedup so the construction
    * cannot diverge. Docs with fewer than 3 tokens have no shingles and
    * drop out.
    */
  /** The planted-duplicate corpus shared by the incremental-dedup and
    * decision-check queries: every 25th doc takes its doc_id+1 neighbor's
    * text, making (k, k+1) ground-truth identical pairs that any
    * deterministic dedup path must find. ONE Spark-side copy — four
    * queries and their DuckDB oracle twins share this ground truth, and
    * a drift in any copy would silently desynchronize them.
    */
  private def plantedCorpus(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val donor = docs.select(($"doc_id" - 1).as("doc_id"), $"text".as("donor_text"))
    docs.join(donor, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CASE WHEN doc_id % 25 = 0 AND donor_text IS NOT NULL " +
          "THEN donor_text ELSE text END AS text")
  }

  private[graft] def md5LshBands(docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs
      .where(s"SIZE($TokensExpr) >= 3")
      .selectExpr("doc_id", "graft_md5_minhash(text, 4) AS sig")
      .selectExpr("doc_id",
        "STACK(2, 0, MD5(CONCAT(ELEMENT_AT(sig, 1), ELEMENT_AT(sig, 2))), " +
          "1, MD5(CONCAT(ELEMENT_AT(sig, 3), ELEMENT_AT(sig, 4)))) " +
          "AS (band_idx, band_key)")
  }

  /** Oracle-able 16-bit SimHash (MD5 bit-planes over whitespace tokens),
    * shared by the fingerprint query and the banded-Hamming pair query.
    * The digest is hoisted into a pre-projection: MD5 inside each of the
    * 16 SUMs would hash every token 16× (measured ~7.4 s at sf0.1).
    * Repartition by doc_id before the token explode: parallelizes the
    * tokenize+hash fan-out across cores (single-file scan = one task) and
    * pre-clusters for the groupBy — one shuffle total, carrying documents,
    * not tokens.
    */
  private def md5Simhash16(s: SparkSession, dir: String): DataFrame = {
    val bitSums = (0 until 16).map { b =>
      val k = 1 + b / 4; val p = 1 << (b % 4)
      s"SUM(CASE WHEN (CAST(INSTR('0123456789abcdef', SUBSTR(h, $k, 1)) - 1 AS INT) DIV $p) % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
    }
    val code = (0 until 16)
      .map(b => s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1 << b}")
      .mkString(" + ")
    Tables.documents(s, dir)
      .repartition(col("doc_id"))
      .selectExpr("doc_id", s"EXPLODE($TokensExpr) AS t")
      .selectExpr("doc_id", "MD5(t) AS h")
      .groupBy("doc_id")
      .agg(expr(bitSums.head), bitSums.tail.map(expr): _*)
      .selectExpr("doc_id", s"CAST($code AS INT) AS simhash16")
  }

  /** Shared MD5 winnowing fingerprint index (doc_id, fp): char-5-gram MD5
    * hashes, window-4 minima, distinct per doc — the rows-first linear
    * shape (see the r4 plan note on text_winnow_md5 below), bounded to
    * `bound` docs.
    */
  private def md5WinnowIndex(s: SparkSession, dir: String, bound: Int) = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    Tables.documents(s, dir)
      .where(s"doc_id < $bound")
      // Repartition by doc_id BEFORE the explode: the source is one
      // parquet file, so without it a single scan task pays the whole
      // explode+hash fan-out. Hash-partitioning on doc_id also satisfies
      // the window's and distinct's clustering — no further shuffle.
      .repartition(col("doc_id"))
      .selectExpr("doc_id",
        "LOWER(REGEXP_REPLACE(text, '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+', ' ')) AS norm")
      .where("LENGTH(norm) >= 8")
      .selectExpr("doc_id", "LENGTH(norm) - 4 AS n_h", "norm",
        "EXPLODE(SEQUENCE(1, LENGTH(norm) - 4)) AS i")
      .selectExpr("doc_id", "n_h", "i", "MD5(SUBSTRING(norm, i, 5)) AS h")
      .withColumn("fp",
        min($"h").over(Window.partitionBy($"doc_id").orderBy($"i").rowsBetween(0, 3)))
      .where($"i" <= $"n_h" - 3)
      .select($"doc_id", $"fp")
      .distinct()
  }

  private val DuckTokens = "regexp_extract_all(text, '\\S+')"

  /** Direct 8-gram decontamination oracle over the canary-augmented
    * corpus — shared verbatim by `text_decontaminate` (self-contained
    * benchmark side) and `text_decont_standing` (benchmark grams served
    * from the persisted DecontaminationIndex, incl. compaction + replays):
    * the standing path must reproduce the direct overlap hash-for-hash.
    */
  private lazy val DecontOracle: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0
       |         THEN text || ' $DecontCanary' ELSE text END AS text
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |    md5(array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS gram
       |  FROM (
       |    SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
       |    FROM (SELECT doc_id, $DuckTokens AS toks FROM aug)
       |    WHERE len(toks) >= 8)),
       |hits AS (
       |  SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n
       |  FROM g JOIN g b ON g.gram = b.gram
       |   AND b.doc_id % 97 = 0 AND g.doc_id <> b.doc_id
       |  GROUP BY g.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_grams,
       |       h.n IS NOT NULL AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin

  /** Direct BM25 oracle over the documents table — shared verbatim by
    * `text_bm25_topk` (the self-contained plan) and `text_standing_bm25`
    * (the persisted inverted-index path): the standing index must
    * reproduce the direct computation hash-for-hash.
    */
  private lazy val Bm25DirectOracle: String =
    s"""WITH base AS (
       |  SELECT doc_id, len(toks) AS dl,
       |         list_filter(list_transform(toks, t -> lower(t)),
       |                     t -> t IN (${inList(Bm25Terms)})) AS hits
       |  FROM (SELECT doc_id, $DuckTokens AS toks FROM documents)),
       |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(hits) AS term
       |        FROM base WHERE len(hits) > 0)
       |  GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT tf.doc_id, $Bm25ContribExpr AS cm
       |  FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN stats)
       |SELECT doc_id, CAST(SUM(cm) AS BIGINT) AS score_micro
       |FROM sc GROUP BY 1
       |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      ("SELECT text, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies " +
       "FROM documents GROUP BY text"),
    "dedup_substring_spans" ->
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |), grams AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         md5(array_to_string(ts[i:i+7], ' ')) AS g
         |  FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS t(i)
         |  WHERE len(ts) >= 8
         |), dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
         |flagged AS (
         |  SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)
         |), gap AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
         |         THEN 1 ELSE 0 END AS brk
         |  FROM flagged
         |), isl AS (
         |  SELECT doc_id, pos,
         |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM gap
         |), spans AS (
         |  SELECT doc_id, island, MIN(pos) AS span_start,
         |         MAX(pos) - MIN(pos) + 8 AS span_ntokens
         |  FROM isl GROUP BY doc_id, island
         |)
         |SELECT s.doc_id, s.span_start, s.span_ntokens,
         |  md5(array_to_string(
         |    t.ts[s.span_start : s.span_start + s.span_ntokens - 1], ' '))
         |    AS span_md5
         |FROM spans s JOIN toks t USING (doc_id)
         |""".stripMargin),
    "dedup_substring_removed" ->
      ("""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |), grams AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         md5(array_to_string(ts[i:i+7], ' ')) AS g
         |  FROM toks, UNNEST(generate_series(1, len(ts) - 7)) AS t(i)
         |  WHERE len(ts) >= 8
         |), later AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
         |    FROM grams)
         |  WHERE rn > 1
         |), gap AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
         |         THEN 1 ELSE 0 END AS brk
         |  FROM later
         |), isl AS (
         |  SELECT doc_id, pos,
         |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM gap
         |), spans AS (
         |  SELECT doc_id, island, MIN(pos) AS span_start,
         |         MAX(pos) - MIN(pos) + 8 AS span_ntokens
         |  FROM isl GROUP BY doc_id, island
         |), tokpos AS (
         |  SELECT doc_id, CAST(t.i AS BIGINT) AS pos, ts[t.i] AS tok
         |  FROM toks, UNNEST(generate_series(1, len(ts))) AS t(i)
         |), removedpos AS (
         |  SELECT DISTINCT s.doc_id, rp.p AS pos
         |  FROM spans s,
         |    UNNEST(generate_series(s.span_start,
         |      s.span_start + s.span_ntokens - 1)) AS rp(p)
         |), kept AS (
         |  SELECT tp.doc_id, tp.pos, tp.tok
         |  FROM tokpos tp LEFT JOIN removedpos r
         |    ON tp.doc_id = r.doc_id AND tp.pos = r.pos
         |  WHERE r.pos IS NULL
         |), agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |         md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT d.doc_id, COALESCE(a.n_kept, 0) AS n_kept,
         |       COALESCE(a.kept_md5, md5('')) AS kept_md5
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |""".stripMargin),
    "dedup_exact_hash" ->
      ("SELECT MD5(text) AS text_hash, MIN(doc_id) AS keep_id, " +
       "CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY MD5(text)"),
    "text_stats" ->
      (s"SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_chars_c, " +
       s"CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes, " +
       s"CAST(LEN($DuckTokens) AS INTEGER) AS n_tokens, " +
       s"CAST(LEN(LIST_DISTINCT($DuckTokens)) AS INTEGER) AS n_uniq_tokens, " +
       s"CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / LEN($DuckTokens) AS avg_tok_len " +
       "FROM documents"),
    "text_token_bpe" ->
      ("SELECT doc_id, " +
       "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens, " +
       "CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS INTEGER) AS n_bpe_uniq " +
       "FROM documents"),
    "text_quality" ->
      (s"SELECT doc_id, n_tokens, n_stop, CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio, " +
       "CASE WHEN n_tokens < 10 THEN 'short' " +
       "WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.2 THEN 'stopwordy' ELSE 'ok' END AS quality_band " +
       s"FROM (SELECT doc_id, CAST(LEN($DuckTokens) AS INTEGER) AS n_tokens, " +
       s"CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN (${inList(Stopwords)}))) AS INTEGER) AS n_stop " +
       "FROM documents)"),
    "text_fingerprint" ->
      ("SELECT doc_id, MD5(LOWER(REGEXP_REPLACE(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS fp " +
       "FROM documents"),
    "lang_dist" ->
      ("SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(n_chars) AS min_chars, " +
       "MAX(n_chars) AS max_chars, AVG(n_chars) AS avg_chars " +
       "FROM documents GROUP BY lang"),
    "lang_id_ngram" -> {
      val en = inList(Seq("the", "and", "of", "to", "is"))
      val de = inList(Seq("der", "die", "das", "und", "ist"))
      val es = inList(Seq("el", "la", "de", "que", "y"))
      val fr = inList(Seq("le", "les", "et", "des", "un"))
      "SELECT doc_id, lang, " +
        "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' " +
        "WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' " +
        "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang " +
        s"FROM (SELECT doc_id, lang, " +
        s"CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($en))) AS INTEGER) AS s_en, " +
        s"CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($de))) AS INTEGER) AS s_de, " +
        s"CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($es))) AS INTEGER) AS s_es, " +
        s"CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($fr))) AS INTEGER) AS s_fr " +
        "FROM documents)"
    },
    "text_chunking" ->
      (s"""WITH t AS (SELECT doc_id, $DuckTokens AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |        unnest(range(0, CAST(FLOOR((len(toks) - 1) / 24) AS INTEGER) + 1)) AS chunk_idx
         |      FROM t)
         |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         |       array_to_string(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ') AS chunk_text,
         |       CAST(len(toks[chunk_idx * 24 + 1 : chunk_idx * 24 + 32]) AS INTEGER) AS n_chunk_tokens
         |FROM c""".stripMargin),
    "text_seq_packing" ->
      (s"""WITH t AS (SELECT doc_id, CAST(LEN($DuckTokens) AS INTEGER) AS n_tokens
         |           FROM documents),
         |b AS (SELECT doc_id, n_tokens,
         |        CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000)
         |          AS BIGINT) AS bin_id
         |      FROM t)
         |SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM b GROUP BY bin_id""".stripMargin),
    "corpus_clean_e2e" -> {
      val en = inList(Seq("the", "and", "of", "to", "is"))
      val de = inList(Seq("der", "die", "das", "und", "ist"))
      val es = inList(Seq("el", "la", "de", "que", "y"))
      val fr = inList(Seq("le", "les", "et", "des", "un"))
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    CAST(LEN($DuckTokens) AS INTEGER) AS n_tokens,
         |    CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN (${inList(Stopwords)}))) AS INTEGER) AS n_stop,
         |    CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($en))) AS INTEGER) AS s_en,
         |    CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($de))) AS INTEGER) AS s_de,
         |    CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($es))) AS INTEGER) AS s_es,
         |    CAST(LEN(LIST_FILTER($DuckTokens, t -> t IN ($fr))) AS INTEGER) AS s_fr
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored
         |  WHERE s_en >= s_de AND s_en >= s_es AND s_en >= s_fr
         |    AND n_tokens >= 10 AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.2),
         |exact AS (
         |  SELECT MD5(text) AS text_hash, MIN(doc_id) AS doc_id,
         |         MIN(text) AS text, MIN_BY(n_tokens, doc_id) AS n_tokens,
         |         CAST(COUNT(*) AS BIGINT) AS n_exact_copies
         |  FROM kept GROUP BY MD5(text)),
         |sigs AS (SELECT doc_id, n_tokens, n_exact_copies, $sigCols FROM exact)
         |SELECT MIN(doc_id) AS keep_id, MIN_BY(n_tokens, doc_id) AS n_tokens,
         |       CAST(SUM(n_exact_copies) AS BIGINT) AS n_members
         |FROM sigs GROUP BY mh_0, mh_1, mh_2, mh_3""".stripMargin
    },
    "dedup_minhash_md5" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      s"SELECT doc_id, $sigCols FROM documents WHERE LEN($DuckTokens) >= 3"
    },
    "text_redact_pii" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
      val ip = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
      val num = "[0-9]{7,}"
      s"""WITH r AS (
         |  SELECT doc_id, text || ' contact user' || doc_id ||
         |    '@mail.example.org or call 555' || (doc_id * 7919 + 1000000) ||
         |    ' from 10.0.' || (doc_id % 256) || '.7' AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '$email')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '$ip')) AS INTEGER) AS n_ips,
         |  CAST(len(regexp_extract_all(raw, '$num')) AS INTEGER) AS n_nums,
         |  regexp_replace(regexp_replace(regexp_replace(raw,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$num', '<NUM>', 'g') AS red_text
         |FROM r""".stripMargin
    },
    "privacy_k_anonymity" ->
      ("""SELECT c_nationkey, c_mktsegment,
         |       CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bin,
         |       COUNT(*) AS n
         |FROM customer
         |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5""".stripMargin),
    "privacy_l_diversity" ->
      ("""SELECT c_nationkey,
         |       CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bin,
         |       COUNT(*) AS n,
         |       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
         |FROM customer
         |GROUP BY 1, 2 HAVING COUNT(DISTINCT c_mktsegment) < 2""".stripMargin),
    "dedup_lsh_bands_md5" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      s"""WITH sigs AS (
         |  SELECT doc_id, $sigCols FROM documents WHERE LEN($DuckTokens) >= 3)
         |SELECT doc_id, CAST(0 AS INTEGER) AS band_idx, md5(mh_0 || mh_1) AS band_key FROM sigs
         |UNION ALL
         |SELECT doc_id, CAST(1 AS INTEGER), md5(mh_2 || mh_3) FROM sigs""".stripMargin
    },
    "sample_split_leakage" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |all_docs AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text,
         |    substr(md5('split:' || d.doc_id), 1, 1) IN ('0', '1') AS is_eval
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |sigs AS (
         |  SELECT doc_id, is_eval, $sigCols FROM all_docs
         |  WHERE LEN($DuckTokens) >= 3),
         |bands AS (
         |  SELECT doc_id, is_eval, CAST(0 AS INTEGER) AS band_idx,
         |         md5(mh_0 || mh_1) AS band_key FROM sigs
         |  UNION ALL
         |  SELECT doc_id, is_eval, CAST(1 AS INTEGER), md5(mh_2 || mh_3) FROM sigs),
         |pairs AS (
         |  SELECT DISTINCT e.doc_id AS eval_doc, t.doc_id AS train_doc
         |  FROM bands e JOIN bands t
         |    ON e.band_idx = t.band_idx AND e.band_key = t.band_key
         |  WHERE e.is_eval AND NOT t.is_eval)
         |SELECT eval_doc, COUNT(*) AS n_leaky_train_docs
         |FROM pairs GROUP BY 1""".stripMargin
    },
    "dedup_incremental" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      def bands(src: String) =
        s"""SELECT doc_id, CAST(0 AS INTEGER) AS band_idx, md5(mh_0 || mh_1) AS band_key FROM $src
           |  UNION ALL
           |  SELECT doc_id, CAST(1 AS INTEGER), md5(mh_2 || mh_3) FROM $src""".stripMargin
      s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |all_docs AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND d.doc_id % 5 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |corpus AS (SELECT * FROM all_docs WHERE doc_id % 5 <> 0),
         |batch AS (SELECT * FROM all_docs WHERE doc_id % 5 = 0),
         |exact AS (
         |  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)),
         |bsig AS (SELECT doc_id, $sigCols FROM batch WHERE LEN($DuckTokens) >= 3),
         |csig AS (SELECT doc_id, $sigCols FROM corpus WHERE LEN($DuckTokens) >= 3),
         |bb AS (${bands("bsig")}),
         |cb AS (${bands("csig")}),
         |cand AS (
         |  SELECT DISTINCT bb.doc_id, cb.doc_id AS corpus_id
         |  FROM bb JOIN cb ON bb.band_idx = cb.band_idx AND bb.band_key = cb.band_key),
         |cn AS (SELECT doc_id, COUNT(*) AS n FROM cand GROUP BY doc_id)
         |SELECT b.doc_id, e.doc_id IS NOT NULL AS is_exact_dup,
         |       CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_candidates
         |FROM batch b LEFT JOIN exact e ON b.doc_id = e.doc_id
         |LEFT JOIN cn ON b.doc_id = cn.doc_id""".stripMargin
    },
    "text_boilerplate" ->
      """WITH raw AS (
        |  SELECT doc_id, text || '. Subscribe to our newsletter today. ' ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'Visit example dot com for more. ' ELSE '' END ||
        |    'Doc ' || doc_id || ' unique closing line.' AS raw
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |         TRIM(arr[CAST(i AS INTEGER) + 1]) AS seg
        |  FROM (SELECT doc_id, regexp_split_to_array(raw, '[.][ ]') AS arr FROM raw),
        |       unnest(range(0, len(arr))) AS t(i)
        |  WHERE TRIM(arr[CAST(i AS INTEGER) + 1]) != ''),
        |freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT s.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(CASE WHEN f.df >= 0.5 * (SELECT n_docs FROM n)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
        |  COALESCE(STRING_AGG(CASE WHEN f.df < 0.5 * (SELECT n_docs FROM n)
        |                           THEN s.seg END, '. ' ORDER BY s.pos), '')
        |    AS clean_text
        |FROM segs s JOIN freq f USING (seg)
        |GROUP BY 1""".stripMargin,
    "dedup_index_persisted" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      def bands(src: String) =
        s"""SELECT doc_id, CAST(0 AS INTEGER) AS band_idx, md5(mh_0 || mh_1) AS band_key FROM $src
           |  UNION ALL
           |  SELECT doc_id, CAST(1 AS INTEGER), md5(mh_2 || mh_3) FROM $src""".stripMargin
      s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |all_docs AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND d.doc_id % 5 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |corpus AS (SELECT * FROM all_docs WHERE doc_id % 5 <> 0),
         |batch AS (SELECT * FROM all_docs WHERE doc_id % 5 = 0),
         |exact AS (
         |  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)),
         |bsig AS (SELECT doc_id, $sigCols FROM batch WHERE LEN($DuckTokens) >= 3),
         |csig AS (SELECT doc_id, $sigCols FROM corpus WHERE LEN($DuckTokens) >= 3),
         |asig AS (SELECT doc_id, $sigCols FROM all_docs WHERE LEN($DuckTokens) >= 3),
         |bb AS (${bands("bsig")}),
         |cb AS (${bands("csig")}),
         |ab AS (${bands("asig")}),
         |cand AS (
         |  SELECT DISTINCT bb.doc_id, cb.doc_id AS corpus_id
         |  FROM bb JOIN cb ON bb.band_idx = cb.band_idx AND bb.band_key = cb.band_key),
         |cn AS (SELECT doc_id, COUNT(*) AS n FROM cand GROUP BY doc_id),
         |cand2 AS (
         |  SELECT DISTINCT bb.doc_id, ab.doc_id AS corpus_id
         |  FROM bb JOIN ab ON bb.band_idx = ab.band_idx AND bb.band_key = ab.band_key),
         |cn2 AS (SELECT doc_id, COUNT(*) AS n FROM cand2 GROUP BY doc_id)
         |SELECT b.doc_id, e.doc_id IS NOT NULL AS is_exact_dup,
         |       CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_candidates,
         |       true AS exact_after,
         |       CAST(COALESCE(cn2.n, 0) AS BIGINT) AS n_candidates_after
         |FROM batch b LEFT JOIN exact e ON b.doc_id = e.doc_id
         |LEFT JOIN cn ON b.doc_id = cn.doc_id
         |LEFT JOIN cn2 ON b.doc_id = cn2.doc_id""".stripMargin
    },
    // same check recompute as dedup_index_persisted's day-2 report —
    // deliberately tag/archive-blind: compaction must be invisible
    "dedup_index_compacted" -> {
      val duckShingles =
        s"list_transform(range(1, len($DuckTokens) - 1), " +
          s"i -> ($DuckTokens)[i] || ' ' || ($DuckTokens)[i+1] || ' ' || ($DuckTokens)[i+2])"
      val sigCols = (0 until 4).map { k =>
        s"LIST_MIN(list_transform($duckShingles, sh -> MD5('$k:' || sh))) AS mh_$k"
      }.mkString(", ")
      def bands(src: String) =
        s"""SELECT doc_id, CAST(0 AS INTEGER) AS band_idx, md5(mh_0 || mh_1) AS band_key FROM $src
           |  UNION ALL
           |  SELECT doc_id, CAST(1 AS INTEGER), md5(mh_2 || mh_3) FROM $src""".stripMargin
      s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |all_docs AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND d.doc_id % 5 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |corpus AS (SELECT * FROM all_docs WHERE doc_id % 5 <> 0),
         |batch AS (SELECT * FROM all_docs WHERE doc_id % 5 = 0),
         |exact AS (
         |  SELECT DISTINCT b.doc_id FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)),
         |bsig AS (SELECT doc_id, $sigCols FROM batch WHERE LEN($DuckTokens) >= 3),
         |csig AS (SELECT doc_id, $sigCols FROM corpus WHERE LEN($DuckTokens) >= 3),
         |bb AS (${bands("bsig")}),
         |cb AS (${bands("csig")}),
         |cand AS (
         |  SELECT DISTINCT bb.doc_id, cb.doc_id AS corpus_id
         |  FROM bb JOIN cb ON bb.band_idx = cb.band_idx AND bb.band_key = cb.band_key),
         |cn AS (SELECT doc_id, COUNT(*) AS n FROM cand GROUP BY doc_id)
         |SELECT b.doc_id, e.doc_id IS NOT NULL AS is_exact_dup,
         |       CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_candidates
         |FROM batch b LEFT JOIN exact e ON b.doc_id = e.doc_id
         |LEFT JOIN cn ON b.doc_id = cn.doc_id""".stripMargin
    },
    "dedup_xx_planted_decisions" ->
      """SELECT p.doc_id AS id_a, d.doc_id AS id_b,
        |       CAST(0 AS INTEGER) AS simhash_hamming,
        |       true AS simhash_found, true AS winnow_sets_equal
        |FROM documents d JOIN documents p ON p.doc_id = d.doc_id - 1
        |WHERE p.doc_id % 25 = 0 AND d.doc_id < 200
        |  AND length(d.text) >= 1""".stripMargin,
    "dedup_decision_xcheck" ->
      s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |planted AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |eligible AS (
         |  SELECT doc_id, md5(text) AS h FROM planted WHERE LEN($DuckTokens) >= 3)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       true AS xx_found, true AS md5_found, true AS agree
         |FROM eligible a JOIN eligible b ON a.h = b.h AND a.doc_id < b.doc_id""".stripMargin,
    "dedup_simhash_md5" -> duckSimhash16,
    "dedup_simhash_pairs" ->
      s"""WITH sh AS ($duckSimhash16),
         |bands AS (SELECT doc_id, simhash16, unnest([0, 1, 2, 3]) AS band_idx FROM sh),
         |nb AS (SELECT doc_id, simhash16, band_idx,
         |       CAST((simhash16 >> (band_idx * 4)) & 15 AS INTEGER) AS nib FROM bands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, a.simhash16 AS code_a,
         |         b.doc_id AS id_b, b.simhash16 AS code_b
         |  FROM nb a JOIN nb b
         |    ON a.band_idx = b.band_idx AND a.nib = b.nib AND a.doc_id < b.doc_id
         |  WHERE a.doc_id < 1000 AND b.doc_id < 1000)
         |SELECT id_a, id_b,
         |       CAST(bit_count(xor(code_a, code_b)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(code_a, code_b)) <= 3""".stripMargin,
    "text_decontaminate" -> DecontOracle,
    "text_decont_standing" -> DecontOracle,
    "pipeline_curate_standing" ->
      (s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0
         |         THEN text || ' $DecontCanary' ELSE text END AS text
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, text,
         |         CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS b
         |  FROM aug WHERE len($DuckTokens) >= 5),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS gram
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM (SELECT doc_id, $DuckTokens AS toks FROM aug)
         |    WHERE len(toks) >= 8)),
         |cont AS (
         |  SELECT DISTINCT g.doc_id
         |  FROM g JOIN g bg ON g.gram = bg.gram
         |   AND bg.doc_id % 97 = 0 AND g.doc_id <> bg.doc_id),
         |surv AS (
         |  SELECT q.doc_id, q.b, md5(q.text) AS h FROM q
         |  WHERE q.doc_id NOT IN (SELECT doc_id FROM cont))
         |SELECT s.doc_id, CAST(s.b AS BIGINT) AS ingest_batch_id
         |FROM surv s
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM surv e WHERE e.h = s.h AND e.b < s.b)""".stripMargin),
    "sample_stratified_quota" ->
      ("""SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
         |  SELECT doc_id, lang,
         |         row_number() OVER (PARTITION BY lang ORDER BY MD5(text), doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 20""".stripMargin),
    "sample_mix_weighted" ->
      (s"""SELECT doc_id, lang FROM documents
         |WHERE SUBSTRING(MD5(doc_id || ':' || lang), 1, 2) < $MixCase""".stripMargin),
    "sample_curriculum_order" ->
      (s"""WITH t AS (
         |  SELECT doc_id, LEN($DuckTokens) AS n_tokens,
         |         MD5('graft-curr:42:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |         CASE WHEN n_tokens >= 60 THEN 0
         |              WHEN n_tokens >= 30 THEN 1 ELSE 2 END AS band,
         |         hx,
         |         ('0x' || SUBSTRING(hx, 1, 8))::BIGINT % 4 AS shard_id
         |  FROM t)
         |SELECT doc_id, band, shard_id,
         |       CAST(row_number() OVER (PARTITION BY band, shard_id
         |                               ORDER BY hx, doc_id) AS BIGINT)
         |         AS pos_in_shard
         |FROM b""".stripMargin),
    "shard_shuffle" ->
      ("""WITH h AS (
         |  SELECT doc_id,
         |         MD5('graft-shuffle:42:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM documents)
         |SELECT doc_id,
         |       ('0x' || SUBSTRING(hx, 1, 8))::BIGINT % 16 AS shard_id,
         |       CAST(row_number() OVER (
         |         PARTITION BY ('0x' || SUBSTRING(hx, 1, 8))::BIGINT % 16
         |         ORDER BY hx, doc_id) AS INTEGER) AS pos_in_shard
         |FROM h""".stripMargin),
    "pipeline_llm_curate" ->
      (s"""WITH aug AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN doc_id % 9 = 0 OR doc_id % 97 = 0
         |         THEN text || ' $DecontCanary' ELSE text END AS text
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(LEN(toks) AS INTEGER) AS n_tokens,
         |    CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS INTEGER) AS sum_tok_len,
         |    CAST(LEN(LIST_FILTER(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS INTEGER) AS n_alpha,
         |    CAST(LEN(LIST_FILTER(toks, x -> x IN (${inList(Stopwords)}))) AS INTEGER) AS n_stop
         |  FROM (SELECT doc_id, lang, text, $DuckTokens AS toks FROM aug)),
         |qs AS (
         |  SELECT doc_id, lang, text FROM q WHERE $GopherPass),
         |dd AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text,
         |           MIN(doc_id) OVER (PARTITION BY md5(text)) AS mn
         |    FROM qs)
         |  WHERE doc_id = mn),
         |bg AS (
         |  SELECT DISTINCT doc_id AS bench_id,
         |    md5(array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS gram
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM (SELECT doc_id, $DuckTokens AS toks FROM aug WHERE doc_id % 97 = 0)
         |    WHERE len(toks) >= 8)),
         |g AS (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS gram
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM (SELECT dd.doc_id, $DuckTokens AS toks FROM dd)
         |    WHERE len(toks) >= 8)),
         |hits AS (
         |  SELECT DISTINCT g.doc_id
         |  FROM g JOIN bg ON g.gram = bg.gram AND g.doc_id <> bg.bench_id),
         |cl AS (
         |  SELECT dd.doc_id, dd.lang FROM dd
         |  LEFT JOIN hits ON dd.doc_id = hits.doc_id
         |  WHERE hits.doc_id IS NULL AND dd.doc_id % 97 <> 0),
         |mx AS (
         |  SELECT doc_id, lang FROM cl
         |  WHERE SUBSTRING(MD5(doc_id || ':' || lang), 1, 2) < $MixCase),
         |h AS (
         |  SELECT doc_id, lang,
         |         MD5('graft-shuffle:42:' || CAST(doc_id AS VARCHAR)) AS hx
         |  FROM mx)
         |SELECT doc_id, lang,
         |       ('0x' || SUBSTRING(hx, 1, 8))::BIGINT % 16 AS shard_id,
         |       CAST(row_number() OVER (
         |         PARTITION BY ('0x' || SUBSTRING(hx, 1, 8))::BIGINT % 16
         |         ORDER BY hx, doc_id) AS INTEGER) AS pos_in_shard
         |FROM h""".stripMargin),
    "text_repetition" ->
      (s"""WITH tc AS (
         |  SELECT doc_id, t, COUNT(*) AS n
         |  FROM (SELECT doc_id, unnest($DuckTokens) AS t FROM documents)
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |       CAST(COUNT(*) AS BIGINT) AS n_uniq_tokens,
         |       CAST(MAX(n) AS BIGINT) AS top_tok_n,
         |       CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_tok_ratio,
         |       1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(n) AS dup_tok_ratio
         |FROM tc GROUP BY doc_id""".stripMargin),
    "text_gopher_rules" ->
      (s"""WITH st AS (
         |  SELECT doc_id,
         |    CAST(LEN($DuckTokens) AS INTEGER) AS n_tokens,
         |    CAST(LIST_SUM(LIST_TRANSFORM($DuckTokens, x -> LENGTH(x))) AS INTEGER) AS sum_tok_len,
         |    CAST(LEN(LIST_FILTER($DuckTokens, x -> regexp_matches(x, '[A-Za-z]'))) AS INTEGER) AS n_alpha,
         |    CAST(LEN(LIST_FILTER($DuckTokens, x -> x IN (${inList(Stopwords)}))) AS INTEGER) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |       CAST(sum_tok_len AS DOUBLE) / n_tokens AS mean_tok_len,
         |       CAST(n_alpha AS DOUBLE) / n_tokens AS alpha_ratio,
         |       ${GopherRules(0)} AS r_count,
         |       ${GopherRules(1)} AS r_meanlen,
         |       ${GopherRules(2)} AS r_alpha,
         |       ${GopherRules(3)} AS r_stop,
         |       $GopherPass AS passes
         |FROM st WHERE n_tokens >= 1""".stripMargin),
    "text_lr_train_xcheck" ->
      ("""SELECT doc_id, doc_id % 2 = 0 AS y, doc_id % 2 = 0 AS predicted
         |FROM documents""".stripMargin),
    "text_hash_classifier" ->
      (s"""WITH t AS (SELECT doc_id, $DuckTokens AS toks FROM documents),
         |sc AS (
         |  SELECT doc_id, CAST(LEN(toks) AS INTEGER) AS n_tokens,
         |    CAST(LIST_SUM(LIST_TRANSFORM(toks, t ->
         |      (ASCII(SUBSTR(MD5(t), 1, 1)) * 256 +
         |       ASCII(SUBSTR(MD5(t), 2, 1))) % 61 - 30)) AS BIGINT) AS raw_score
         |  FROM t WHERE LEN(toks) >= 1)
         |SELECT doc_id, n_tokens, raw_score,
         |       CAST(raw_score AS DOUBLE) / n_tokens AS clf_score,
         |       CAST(raw_score AS DOUBLE) / n_tokens > 0.0 AS keep
         |FROM sc""".stripMargin),
    "text_winnow_md5" ->
      s"""WITH ${duckWinnowCte(100)}
        |SELECT doc_id, unnest(fps) AS fp FROM m""".stripMargin,
    "text_winnow_pairs" ->
      s"""WITH ${duckWinnowCte(200)},
        |idx AS (SELECT doc_id, unnest(fps) AS fp FROM m)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin,
    "sample_upsample_epochs" ->
      (s"""SELECT doc_id, lang, CAST(e AS INTEGER) AS epoch FROM (
         |  SELECT doc_id, lang, unnest(range(1, base + extra + 1)) AS e FROM (
         |    SELECT doc_id, lang, $EpochBase AS base,
         |      CASE WHEN SUBSTRING(MD5('ep:' || doc_id || ':' || lang), 1, 2)
         |           < $EpochFracHex THEN 1 ELSE 0 END AS extra
         |    FROM documents))""".stripMargin),
    "text_bpe_pair_freq" ->
      ("""WITH wf AS (
         |  SELECT word, COUNT(*) AS freq FROM (
         |    SELECT unnest(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS word
         |    FROM documents)
         |  WHERE LENGTH(word) >= 2 GROUP BY word),
         |p AS (
         |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, freq
         |  FROM (SELECT word, freq, unnest(range(1, LENGTH(word))) AS i FROM wf))
         |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
         |FROM p GROUP BY pair
         |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin),
    "text_bpe_train_xcheck" ->
      ("""WITH wf AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS word
         |    FROM documents)
         |  WHERE LENGTH(word) = 2 GROUP BY word)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC)
         |         AS INTEGER) AS rank,
         |       substr(word, 1, 1) AS lhs, substr(word, 2, 1) AS rhs,
         |       freq AS n_occurrences
         |FROM wf ORDER BY freq DESC, word ASC LIMIT 12""".stripMargin),
    "text_bpe_encode_xcheck" ->
      ("""WITH wf AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS word
         |    FROM documents)
         |  WHERE LENGTH(word) = 2 GROUP BY word),
         |top AS (SELECT word FROM wf ORDER BY freq DESC, word ASC LIMIT 12)
         |SELECT wf.word AS word,
         |       CASE WHEN top.word IS NOT NULL THEN 1 ELSE 2 END AS n_syms,
         |       CASE WHEN top.word IS NOT NULL THEN wf.word
         |            ELSE substr(wf.word, 1, 1) || ' ' || substr(wf.word, 2, 1)
         |       END AS encoded
         |FROM wf LEFT JOIN top ON wf.word = top.word""".stripMargin),
    "text_tfidf_topk" ->
      (s"""WITH t AS (
         |  SELECT doc_id, LOWER(tok) AS term FROM (
         |    SELECT doc_id, unnest($DuckTokens) AS tok FROM documents)),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    CAST(ROUND(tf.tf * LN(
         |      CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df)
         |      * 1000000) AS BIGINT) AS tfidf_micro
         |  FROM tf JOIN df ON tf.term = df.term)
         |SELECT doc_id, term, tf, tfidf_micro, CAST(rn AS INTEGER) AS rn FROM (
         |  SELECT sc.*, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf_micro DESC, term) AS rn
         |  FROM sc)
         |WHERE rn <= 3""".stripMargin),
    "dedup_span_runs" ->
      (s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |base AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |g AS (
         |  SELECT doc_id, i,
         |    md5(array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ')) AS gram
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM (SELECT doc_id, $DuckTokens AS toks FROM base)
         |    WHERE len(toks) >= 8)),
         |h AS (
         |  SELECT doc_id, i FROM (
         |    SELECT doc_id, i,
         |           MIN(doc_id) OVER (PARTITION BY gram) AS mn,
         |           MAX(doc_id) OVER (PARTITION BY gram) AS mx
         |    FROM g)
         |  WHERE mn <> mx),
         |r AS (
         |  SELECT doc_id, i,
         |    SUM(CASE WHEN prev IS NULL OR i <> prev + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY i) AS run
         |  FROM (SELECT doc_id, i,
         |          lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
         |        FROM h))
         |SELECT doc_id, CAST(MIN(i) AS INTEGER) AS span_start,
         |       CAST(MAX(i) + 7 AS INTEGER) AS span_end,
         |       CAST(COUNT(*) AS BIGINT) AS n_dup_grams
         |FROM r GROUP BY doc_id, run""".stripMargin),
    "text_vocab_coverage" ->
      (s"""WITH tf AS (
         |  SELECT LOWER(tok) AS term, COUNT(*) AS freq
         |  FROM (SELECT unnest($DuckTokens) AS tok FROM documents)
         |  GROUP BY 1),
         |f AS (SELECT unnest([${VocabMinFreqs.mkString(", ")}]) AS min_freq)
         |SELECT CAST(f.min_freq AS INTEGER) AS min_freq,
         |  CAST(SUM(CASE WHEN tf.freq >= f.min_freq THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
         |  CAST(SUM(CASE WHEN tf.freq >= f.min_freq THEN tf.freq ELSE 0 END) AS BIGINT) AS covered_tokens,
         |  CAST(SUM(tf.freq) AS BIGINT) AS total_tokens,
         |  CAST(ROUND(SUM(CASE WHEN tf.freq >= f.min_freq THEN tf.freq ELSE 0 END)
         |    * 1000000.0 / SUM(tf.freq)) AS BIGINT) AS coverage_micro
         |FROM tf CROSS JOIN f
         |GROUP BY f.min_freq""".stripMargin),
    "dedup_paragraph_global" ->
      (s"""WITH donor AS (SELECT doc_id - 1 AS doc_id, text AS donor_text FROM documents),
         |base AS (
         |  SELECT d.doc_id,
         |    CASE WHEN d.doc_id % 25 = 0 AND donor_text IS NOT NULL
         |         THEN donor_text ELSE d.text END AS text
         |  FROM documents d LEFT JOIN donor ON d.doc_id = donor.doc_id),
         |raw AS (SELECT doc_id, text || '$ParaSuffix' AS raw FROM base),
         |segs AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         |         TRIM(arr[CAST(i AS INTEGER) + 1]) AS seg
         |  FROM (SELECT doc_id, regexp_split_to_array(raw, '[.][ ]') AS arr FROM raw),
         |       unnest(range(0, len(arr))) AS t(i)
         |  WHERE TRIM(arr[CAST(i AS INTEGER) + 1]) != ''),
         |m1 AS (
         |  SELECT doc_id, pos, seg,
         |         MIN(doc_id) OVER (PARTITION BY seg) AS mn_doc
         |  FROM segs),
         |m2 AS (
         |  SELECT doc_id, pos, seg,
         |    (doc_id = mn_doc AND pos = MIN(CASE WHEN doc_id = mn_doc THEN pos END)
         |       OVER (PARTITION BY seg)) AS keep
         |  FROM m1)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_segments,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  COALESCE(STRING_AGG(CASE WHEN keep THEN seg END, '. ' ORDER BY pos), '')
         |    AS clean_text
         |FROM m2 GROUP BY doc_id""".stripMargin),
    "sample_mix_temperature" ->
      (s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |p AS (SELECT source, n_docs,
         |        CAST(ROUND(POW(n_docs, $MixAlpha) * 1000000) AS BIGINT) AS pow_micro
         |      FROM c)
         |SELECT source, n_docs, pow_micro,
         |  CAST(ROUND(pow_micro * 1000000.0 /
         |    (SELECT SUM(pow_micro) FROM p)) AS BIGINT) AS weight_micro
         |FROM p""".stripMargin),

    "text_bm25_topk" -> Bm25DirectOracle,
    "text_standing_bm25" -> Bm25DirectOracle,
    "text_standing_bm25_compacted" -> Bm25DirectOracle,
    "text_sql_bm25_search" -> Bm25DirectOracle,
    "text_bm25_rm3" ->
      (s"""WITH doclen AS (
         |  SELECT doc_id, len($DuckTokens) AS dl FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM doclen),
         |tf AS (
         |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
         |    SELECT d.doc_id, l.dl,
         |           unnest(list_transform($DuckTokens, t -> lower(t))) AS term
         |    FROM documents d JOIN doclen l ON d.doc_id = l.doc_id)
         |  GROUP BY 1, 2, 3),
         |tf1 AS (SELECT * FROM tf WHERE term IN (${inList(Bm25Terms)})),
         |df1 AS (SELECT term, COUNT(*) AS df FROM tf1 GROUP BY 1),
         |sc1 AS (
         |  SELECT tf1.doc_id, $Bm25ContribExpr AS cm
         |  FROM tf1 JOIN df1 ON tf1.term = df1.term CROSS JOIN stats),
         |fb AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, SUM(cm) AS score FROM sc1 GROUP BY 1
         |    ORDER BY score DESC, doc_id LIMIT 10)),
         |exp AS (
         |  SELECT term FROM (
         |    SELECT tf.term, SUM(tf.tf) AS freq
         |    FROM tf JOIN fb ON tf.doc_id = fb.doc_id
         |    WHERE tf.term NOT IN (${inList(Bm25Terms)})
         |      AND tf.term NOT IN (${inList(Stopwords)})
         |    GROUP BY 1 ORDER BY freq DESC, term LIMIT 5)),
         |allterms AS (
         |  SELECT term FROM exp
         |  UNION ALL
         |  SELECT * FROM (VALUES ${Bm25Terms.map(t => s"('$t')").mkString(", ")})),
         |tf3 AS (SELECT tf.* FROM tf JOIN allterms ON tf.term = allterms.term),
         |df3 AS (SELECT term, COUNT(*) AS df FROM tf3 GROUP BY 1),
         |sc3 AS (
         |  SELECT tf3.doc_id, $Bm25ContribExpr AS cm
         |  FROM tf3 JOIN df3 ON tf3.term = df3.term CROSS JOIN stats)
         |SELECT doc_id, CAST(SUM(cm) AS BIGINT) AS score_micro
         |FROM sc3 GROUP BY 1
         |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin),

    "sample_dsir_weights" ->
      (s"""WITH bi AS (
         |  SELECT doc_id, lang,
         |         substr(md5(toks[CAST(i AS INTEGER)] || ' ' ||
         |                    toks[CAST(i AS INTEGER) + 1]), 1, 2) AS bucket
         |  FROM (SELECT doc_id, lang, toks,
         |               unnest(range(1, len(toks))) AS i
         |        FROM (SELECT doc_id, lang,
         |                list_transform($DuckTokens, t -> lower(t)) AS toks
         |              FROM documents)
         |        WHERE len(toks) >= 2)),
         |b AS (SELECT bucket, COUNT(*) AS cr,
         |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
         |      FROM bi GROUP BY 1),
         |t AS (SELECT COUNT(*) AS t_r,
         |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_t
         |      FROM bi)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(cm) AS BIGINT) AS dsir_micro
         |FROM (SELECT bi.doc_id, $DsirContribExpr AS cm
         |      FROM bi JOIN b USING (bucket) CROSS JOIN t)
         |GROUP BY 1""".stripMargin),

    "text_entropy" ->
      (s"""WITH t AS (
         |  SELECT doc_id, n, term, COUNT(*) AS c
         |  FROM (
         |    SELECT doc_id, len(toks) AS n, unnest(toks) AS term
         |    FROM (SELECT doc_id,
         |            list_transform($DuckTokens, t -> lower(t)) AS toks
         |          FROM documents)
         |    WHERE len(toks) >= 1)
         |  GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |       CAST(SUM($EntropyContribExpr) AS BIGINT) AS entropy_nano
         |FROM t GROUP BY 1, 2""".stripMargin),

    "lang_kl_divergence" ->
      (s"""WITH tok AS (
         |  SELECT source, term FROM (
         |    SELECT source, unnest(list_transform($DuckTokens,
         |             t -> lower(t))) AS term
         |    FROM documents)),
         |st AS (SELECT source, term, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
         |ct AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1),
         |ns AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1)
         |SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
         |       CAST(SUM(cm) AS BIGINT) AS kl_nano
         |FROM (
         |  SELECT source, n_s, $KlContribExpr AS cm FROM (
         |    SELECT st.source, st.term, st.c_st, ct.c_t, ns.n_s,
         |           (SELECT SUM(c_st) FROM st) AS n_tot
         |    FROM st JOIN ct ON st.term = ct.term
         |            JOIN ns ON st.source = ns.source))
         |GROUP BY 1, 2""".stripMargin),

    "text_zipf_slope" ->
      (s"""WITH tf AS (
         |  SELECT term, COUNT(*) AS freq FROM (
         |    SELECT unnest(list_transform($DuckTokens, t -> lower(t))) AS term
         |    FROM documents)
         |  GROUP BY 1),
         |r AS (
         |  SELECT CAST(ROUND(LN(ROW_NUMBER() OVER (ORDER BY freq DESC, term))
         |           * 1000) AS BIGINT) AS xm,
         |         CAST(ROUND(LN(freq) * 1000) AS BIGINT) AS ym
         |  FROM tf),
         |s AS (SELECT COUNT(*) AS n, SUM(xm) AS s1, SUM(ym) AS s2,
         |        SUM(xm * xm) AS s11, SUM(xm * ym) AS s12 FROM r)
         |SELECT CAST(n AS BIGINT) AS n_terms, $ZipfSlopeExpr AS slope_micro
         |FROM s""".stripMargin),

    "text_c4_rules" ->
      ("""WITH pages AS (
         |  SELECT doc_id, CONCAT_WS(chr(10), text,
         |    'The quick brown fox jumps over the lazy dog today.',
         |    CASE WHEN doc_id % 3 = 0
         |      THEN 'lorem ipsum dolor sit amet consectetur.' END,
         |    CASE WHEN doc_id % 4 = 0
         |      THEN 'enable javascript { var x } to view this site.' END,
         |    'Too short.',
         |    CONCAT('Document ', CAST(doc_id AS VARCHAR),
         |      ' ends with a unique proper closing sentence.')) AS page
         |  FROM documents),
         |split AS (
         |  SELECT doc_id, page, string_split(page, chr(10)) AS lines
         |  FROM pages),
         |f AS (
         |  SELECT doc_id, len(lines) AS n_lines,
         |    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
         |      AND len(string_split(l, ' ')) >= 5
         |      AND NOT contains(lower(l), 'javascript')) AS kept,
         |    contains(lower(page), 'lorem ipsum') AS has_lorem,
         |    contains(page, '{') AS has_brace
         |  FROM split)
         |SELECT doc_id, CAST(n_lines AS INTEGER) AS n_lines,
         |  CAST(len(kept) AS INTEGER) AS n_kept, has_lorem, has_brace,
         |  len(kept) >= 3 AND NOT has_lorem AND NOT has_brace AS page_pass,
         |  md5(array_to_string(kept, chr(10))) AS clean_md5
         |FROM f""".stripMargin)
  )

  /** DuckDB twin of [[md5Simhash16]] (a standalone SELECT, also embedded
    * as a CTE by the pair oracle).
    */
  private def duckSimhash16: String = {
    val bitSums = (0 until 16).map { b =>
      val k = 1 + b / 4; val p = 1 << (b % 4)
      s"SUM(CASE WHEN (CAST(strpos('0123456789abcdef', substr(md5(t), $k, 1)) - 1 AS INTEGER) // $p) % 2 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val code = (0 until 16)
      .map(b => s"(CASE WHEN s$b >= 0 THEN 1 ELSE 0 END) * ${1 << b}")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($code AS INTEGER) AS simhash16 FROM (
       |  SELECT doc_id, $bitSums
       |  FROM (SELECT doc_id, unnest($DuckTokens) AS t FROM documents)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB twin of [[md5WinnowIndex]] as CTE bodies ending in `m`
    * (doc_id, fps list) — kept beside the Scala definition so the bound
    * and construction can never silently diverge.
    */
  private def duckWinnowCte(bound: Int): String =
    s"""n AS (
      |  SELECT doc_id, lower(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS norm
      |  FROM documents WHERE doc_id < $bound),
      |h AS (
      |  SELECT doc_id,
      |    list_transform(range(1, length(norm) - 3),
      |      i -> md5(substr(norm, CAST(i AS INTEGER), 5))) AS hs
      |  FROM n WHERE length(norm) >= 8),
      |m AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(hs) - 2),
      |      j -> list_aggregate(hs[CAST(j AS INTEGER):CAST(j+3 AS INTEGER)], 'min'))) AS fps
      |  FROM h)""".stripMargin
}
