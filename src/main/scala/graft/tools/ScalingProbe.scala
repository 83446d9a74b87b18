package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-curve probe for the documents/embeddings operators: replicates
  * the sf documents table `factor`× (each copy's tokens are suffixed with
  * the copy index, so copies share NO shingles — corpus grows `factor`×
  * while the per-copy duplicate structure stays constant, i.e. the probe
  * measures the operators' input scaling, not an artificial duplicate
  * explosion) plus the embeddings table `factor`× (each copy's components
  * perturbed deterministically per copy — identical copies would pile
  * into the same LSH/IVF buckets and measure an artificial bucket
  * blowup, not input scaling), and reports t(factor×)/t(1×) per query.
  * A linear operator lands near `factor`; a quadratic one lands near
  * `factor`² — the out-of-band check plan-level specs can't give.
  *
  * `dedup_cc_groups`'s registered query is bounded (25 docs) by design,
  * so connected components gets a DIRECT probe instead: a synthetic
  * chain-of-4 near-dup graph at |V| and factor·|V| through the same
  * ConnectedComponents.components code path (constant diameter — rounds
  * stay fixed while per-round shuffles scale, exactly the 100 TB shape).
  *
  * Usage: runMain graft.tools.ScalingProbe [sfDir] [factor] [query ...]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val queries = if (args.length > 2) args.drop(2).toSeq
      else Seq("text_stats", "text_token_bpe", "text_quality", "lang_id_ngram",
        "text_fingerprint", "dedup_exact_hash", "dedup_simhash_md5",
        "dedup_minhash_sig", "dedup_lsh_near_pairs", "text_winnowing_fp",
        "text_lm_score", "corpus_clean_e2e", "sim_ann_lsh", "sim_ann_ivf",
        "cc_components")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val scaledDir = graft.queries.Q.scratch(sfDir, s"scaleprobe_x$factor")
    val base = graft.Tables.documents(spark, sfDir)
    val n = base.count()
    val scaled = (0 until factor).map { k =>
      if (k == 0) base
      else base.selectExpr(
        s"doc_id + ${k}L * $n AS doc_id",
        s"concat_ws(' ', transform(regexp_extract_all(text, '\\\\S+', 0), t -> concat(t, '$k'))) AS text",
        "lang", "source", "n_chars")
    }.reduce(_ unionByName _)
    scaled.repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val ne = emb.count()
    val scaledEmb = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.selectExpr(
        s"vec_id + ${k}L * $ne AS vec_id",
        // deterministic per-copy jitter: decorrelates copies so bucketed
        // ANN sees a genuinely bigger corpus, not 10 co-located clones
        s"transform(embedding, (v, i) -> v + CAST((vec_id * 31 + i * 7 + $k) % 17 AS FLOAT) * 0.013F) AS embedding",
        "label")
    }.reduce(_ unionByName _)
    scaledEmb.repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")
    println(s"[probe] scaled corpus: ${n * factor} docs, ${ne * factor} vectors at $scaledDir")

    // Direct connected-components probe (see scaladoc): chain-of-4 graph,
    // |V| = 40 × docs so the 1× side is big enough to dominate fixed cost.
    def ccComponents(nDocs: Long): Unit = {
      val v = nDocs * 40
      val edges = spark.range(v).selectExpr("id AS a", "id + 1 AS b")
        .where("id % 4 < 3")
      graft.dedup.ConnectedComponents.components(edges, "a", "b")
        .write.format("noop").mode("overwrite").save()
    }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      if (name == "cc_components") ccComponents(if (dir == sfDir) n else n * factor)
      else graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"${"query"}%-24s ${"t_1x"}%8s ${"t_" + factor + "x"}%8s ${"ratio"}%7s")
    queries.foreach { q =>
      try {
        // Warm BOTH directories (plans, codegen, scan setup, page cache)
        // before measuring — an unwarmed 10× side would fold one-time
        // overhead into every ratio.
        time(q, sfDir)
        time(q, scaledDir)
        val t1 = time(q, sfDir)
        val tN = time(q, scaledDir)
        println(f"$q%-24s $t1%8.2f $tN%8.2f ${tN / t1}%7.1f")
      } catch {
        case e: Throwable => println(f"$q%-24s FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
