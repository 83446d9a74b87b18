package graft.similarity

// (lives in the similarity package to reach its private[similarity] helpers)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Emits the round-20 before/after physical plans into plans/r20/:
  *
  *  - the StandingAnnIndex IVFADC ingest frame, OLD shape (encode then
  *    re-join cell_id on vec_id — reconstructed inline) vs NEW shape
  *    (cell_id carried through subRows/assignCodes), over the same
  *    inputs;
  *  - the ChangeFeed net-change read feeding replicateTo's fused
  *    single-merge apply.
  *
  * Diagnostic only; run from the repo root.
  */
object R20Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    def dump(name: String, s: String): Unit = {
      val p = java.nio.file.Paths.get(s"plans/r20/$name")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, s.getBytes("UTF-8"))
      println(s"[plans] wrote plans/r20/$name")
    }

    // ---- IVFADC ingest: old re-join shape vs carried shape ----
    val p = graft.queries.Q.scratch(sfDir, "r20plans_ivfpq")
    graft.queries.Q.deleteDir(spark, p)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val idx = new StandingAnnIndex(spark, p)
    idx.trainIvfPq(emb.filter($"vec_id" < 200), nCells = 16, m = 8,
      kCent = 16, ivfIterations = 1, pqIterations = 0)
    val cents = graft.table.SmallSnapshot.read(idx.centroidTable)
    val books = graft.table.SmallSnapshot.read(idx.codebookTable)
    val batch = emb.filter($"vec_id" >= 200 && $"vec_id" < 400)
    val (m, d) = (8, 8)
    val base = batch.select($"vec_id",
      $"embedding".cast("array<double>").as("v"))
    val resid = Ivf.assignCells(base, cents)
      .join(broadcast(cents), Seq("cell_id"))
      .select($"vec_id", $"cell_id",
        zip_with($"v", $"cv", (a, b) => a - b).as("v"))
    // OLD: explode without cell_id, encode, re-join cell_id on vec_id
    def subRowsNoCarry(b: org.apache.spark.sql.DataFrame) =
      b.select($"vec_id",
        expr(s"EXPLODE(TRANSFORM(SEQUENCE(0, ${m - 1}), " +
          s"s -> NAMED_STRUCT('sub_id', s, 'sv', SLICE(v, s * $d + 1, $d))))").as("e"))
        .select($"vec_id", $"e.sub_id".as("sub_id"), $"e.sv".as("sv"))
    val oldShape = Pq
      .assignCodes(subRowsNoCarry(resid.select($"vec_id", $"v")), books)
      .select($"vec_id", $"sub_id", $"code")
      .join(resid.select($"vec_id", $"cell_id"), Seq("vec_id"))
      .withColumn("batch_tag", lit(1L))
    // NEW: cell_id carried through explode + argmin
    val newShape = Pq
      .assignCodes(Pq.subRows(resid, m, d,
        carry = Seq("cell_id")), books, carry = Seq("cell_id"))
      .select($"vec_id", $"sub_id", $"code", $"cell_id")
      .withColumn("batch_tag", lit(1L))
    dump("sim_standing_ivfpq_ingest_before.txt",
      oldShape.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    dump("sim_standing_ivfpq_ingest_after.txt",
      newShape.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    // ---- k14 replicate: the net-change feed read (the fused apply's
    // single merge source) ----
    import graft.table._
    val sp = graft.queries.Q.scratch(sfDir, "r20plans_cdf_src")
    val mp = graft.queries.Q.scratch(sfDir, "r20plans_cdf_dst")
    Seq(sp, sp + "__graft_commits", mp, mp + "__graft_commits")
      .foreach(graft.queries.Q.deleteDir(spark, _))
    val t = MedallionTable(spark, sp)
    val mir = MedallionTable(spark, mp)
    val o = graft.Tables.orders(spark, sfDir).filter($"o_orderkey" % 4 === 1)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
    t.overwrite(o)
    t.enableChangeDataFeed()
    ChangeFeed.replicateTo(t, mir, Seq("o_orderkey"))
    t.append(o.filter($"o_orderkey" % 89 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + 40000000L))
    t.updateVectored($"o_orderkey" % 30 === 1,
      Map("o_orderpriority" -> lit("M1")))
    t.deleteVectored($"o_orderkey" % 50 === 1)
    val feed = t.readChangeFeed(3L, ChangeFeed.capturedThrough(t))
    dump("k14_cdf_feed_read_after.txt",
      feed.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
