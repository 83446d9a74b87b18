package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the corpus_clean_e2e stages. */
object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val T = graft.queries.Q.TokensExpr
    val docs = graft.Tables.documents(spark, sfDir)
    timed("warmup count")(docs.count())
    val scored = docs.selectExpr(
      "doc_id", "text",
      s"SIZE($T) AS n_tokens",
      s"SIZE(FILTER($T, t -> t IN ('the','a','and','of','to','in','is','it'))) AS n_stop",
      s"SIZE(FILTER($T, t -> t IN ('the','and','of','to','is'))) AS s_en",
      s"SIZE(FILTER($T, t -> t IN ('der','die','das','und','ist'))) AS s_de",
      s"SIZE(FILTER($T, t -> t IN ('el','la','de','que','y'))) AS s_es",
      s"SIZE(FILTER($T, t -> t IN ('le','les','et','des','un'))) AS s_fr")
    timed("scored")(scored.count())
    val kept = scored
      .filter("s_en >= s_de AND s_en >= s_es AND s_en >= s_fr")
      .filter("n_tokens >= 10 AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.2")
    timed("kept")(kept.count())
    val exact = kept.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"),
        expr("min_by(n_tokens, doc_id)").as("n_tokens"),
        count(lit(1)).as("n_exact_copies"))
    timed("exact")(exact.count())
    val shingles =
      s"TRANSFORM(SEQUENCE(0, SIZE($T) - 3), " +
        s"i -> CONCAT(($T)[i], ' ', ($T)[i+1], ' ', ($T)[i+2]))"
    val sigCols = (0 until 4).map { k =>
      s"ARRAY_MIN(TRANSFORM($shingles, sh -> MD5(CONCAT('$k:', sh)))) AS mh_$k"
    }
    val sigs = exact.selectExpr(Seq("doc_id", "n_tokens", "n_exact_copies") ++ sigCols: _*)
    timed("sigs")(sigs.count())
    val grouped = sigs.groupBy(col("mh_0"), col("mh_1"), col("mh_2"), col("mh_3"))
      .agg(min(col("doc_id")).as("keep_id"),
        expr("min_by(n_tokens, doc_id)").as("n_tokens"),
        sum(col("n_exact_copies")).as("n_members"))
    timed("sigs+groupby")(grouped.count())
    timed("full")(graft.queries.TextQueries.defs("corpus_clean_e2e")(spark, sfDir).count())
    println(grouped.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
