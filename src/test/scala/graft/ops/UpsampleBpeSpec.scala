package graft.ops

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Invariants for epoch-weighted upsampling and the BPE pair-frequency
  * pass (exact values are oracle-checked by the driver; these pin the
  * semantic shape on sf0.001).
  */
class UpsampleBpeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("upsampling replicates per mixture weight: en 2-3x, de 1-2x, else exactly 1x") {
    import spark.implicits._
    val reps = TextQueries.defs("sample_upsample_epochs")(spark, sf)
      .groupBy($"doc_id", $"lang").agg(count(lit(1)).as("n"), max($"epoch").as("mx"))
      .collect()
    assert(reps.nonEmpty)
    reps.foreach { r =>
      val (lang, n, mx) = (r.getString(1), r.getLong(2), r.getInt(3))
      // epochs are contiguous 1..n: max epoch == replica count
      assert(mx.toLong == n, s"doc ${r.getLong(0)}: epochs not contiguous")
      lang match {
        case "en" => assert(n == 2 || n == 3)
        case "de" => assert(n == 1 || n == 2)
        case _    => assert(n == 1)
      }
    }
    // fractional gate actually fires both ways for en at this sf
    val enCounts = reps.filter(_.getString(1) == "en").map(_.getLong(2)).toSet
    assert(enCounts == Set(2L, 3L), s"en replica counts $enCounts")
  }

  test("pair frequencies over the vocabulary match a direct corpus-level count") {
    import spark.implicits._
    val top = TextQueries.defs("text_bpe_pair_freq")(spark, sf).collect()
    assert(top.length == 50)
    assert(top.forall(_.getString(0).length == 2))
    val counts = top.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "not sorted desc")

    // independent route: explode pairs straight off every word OCCURRENCE
    // (no word-frequency collapse) — the two-stage query must agree
    val direct = graft.Tables.documents(spark, sf)
      .selectExpr("EXPLODE(regexp_extract_all(text, " +
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS word")
      .where("LENGTH(word) >= 2")
      .selectExpr("EXPLODE(TRANSFORM(SEQUENCE(1, LENGTH(word) - 1), " +
        "i -> SUBSTRING(word, i, 2))) AS pair")
      .groupBy($"pair").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    top.foreach { r =>
      assert(direct(r.getString(0)) == r.getLong(1),
        s"pair ${r.getString(0)}: vocab-weighted ${r.getLong(1)} != direct ${direct(r.getString(0))}")
    }
  }
}
