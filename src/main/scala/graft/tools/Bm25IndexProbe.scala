package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling probe for the standing BM25 inverted index: ingest the sf
  * documents corpus at 1× and factor× (the ScalingProbe replication —
  * copy k's tokens carry suffix k, so the query terms' postings live
  * entirely in copy 0 and the QUERY-relevant posting volume stays
  * constant while the corpus grows factor×), then measure
  *
  *   - ingest wall time (expected ~linear in corpus: tokenize once,
  *     one groupBy, partitioned append), and
  *   - warm query wall time (expected ~flat: the probe reads only the
  *     query terms' term_bucket directories, which the replication
  *     leaves unchanged), vs
  *   - the DIRECT self-contained BM25 plan (text_bm25_topk shape),
  *     which re-tokenizes the whole corpus per query and should scale
  *     ~linearly — the gap the standing index exists to close.
  *
  * Honest caveat for SCALING.md: under ORGANIC growth the query terms'
  * df grows with the corpus, so the standing query is O(matching
  * postings), not O(1) — still orders of magnitude below the direct
  * plan's O(all tokens).
  *
  * Usage: runMain graft.tools.Bm25IndexProbe [sfDir] [factor]
  */
object Bm25IndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val terms = Seq("spark", "merge", "window")
    val base = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = base.count()
    val scaled = (0 until factor).map { k =>
      if (k == 0) base
      else base.selectExpr(
        s"doc_id + ${k}L * $n AS doc_id",
        s"concat_ws(' ', transform(regexp_extract_all(text, '\\\\S+', 0), t -> concat(t, '$k'))) AS text")
    }.reduce(_ unionByName _)

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best2(f: => Unit): Double = { timeIt(f); math.min(timeIt(f), timeIt(f)) }

    def direct(docs: DataFrame): Unit = {
      docs.createOrReplaceTempView("probe_docs")
      spark.sql(s"""
        |WITH base AS (
        |  SELECT doc_id, SIZE(toks) AS dl,
        |         FILTER(TRANSFORM(toks, t -> LOWER(t)),
        |                t -> t IN (${terms.map(t => s"'$t'").mkString(",")})) AS hits
        |  FROM (SELECT doc_id, regexp_extract_all(text, '\\\\S+', 0) AS toks
        |        FROM probe_docs)),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM base),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
        |       FROM (SELECT doc_id, dl, EXPLODE(hits) AS term
        |             FROM base WHERE SIZE(hits) > 0) GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.tf AS s FROM tf JOIN dfx ON tf.term = dfx.term)
        |SELECT doc_id, SUM(s) AS score FROM sc GROUP BY 1
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
        .write.format("noop").mode("overwrite").save()
    }

    def run(label: String, docs: DataFrame): Unit = {
      val path = graft.queries.Q.scratch(sfDir, s"bm25probe_$label")
      graft.queries.Q.deleteDir(spark, path)
      val matDir = graft.queries.Q.scratch(sfDir, s"bm25probe_docs_$label")
      docs.write.mode("overwrite").parquet(matDir)
      val mat = spark.read.parquet(matDir)
      val idx = new graft.text.StandingBm25Index(spark, path)
      val tIngest = timeIt(idx.ingest(mat, tag = 1L))
      val tQuery = best2(
        idx.query(terms, 10).write.format("noop").mode("overwrite").save())
      val tDirect = best2(direct(mat))
      println(f"[probe] $label%-8s ingest=$tIngest%7.2fs standing_query=$tQuery%6.2fs direct_plan=$tDirect%6.2fs")
    }

    run("1x", base)
    run(s"${factor}x", scaled)
    spark.stop()
  }
}
