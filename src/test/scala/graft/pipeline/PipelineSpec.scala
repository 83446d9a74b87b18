package graft.pipeline

import graft.SparkSpec

/** End-to-end medallion run on sf0.001 + the idempotency contract: a
  * second full pipeline run (which re-appends every bronze row, like the
  * reference's re-runs) must leave silver and gold byte-for-byte stable —
  * that is what dropDuplicates + MERGE exist for (SURVEY.md §5.4).
  */
class PipelineSpec extends SparkSpec {

  test("bronze→silver→gold end-to-end, idempotent under re-run") {
    val work = tmpDir("pipeline")
    val sf = "/root/testdata/sf0.001"

    Pipeline.run(spark, sf, work)

    def table(p: String) = spark.read.option("mergeSchema", true).parquet(s"$work/$p")
    def snapshot(p: String): (Long, Set[String]) = {
      val df = table(p)
      val cols = df.columns.sorted.toSeq
      (df.count(),
        df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)"): _*)
          .collect().map(_.toSeq.mkString("|")).toSet)
    }

    val goldCount1 = snapshot("gold/wide_orders")
    val silverO1 = snapshot("silver/orders")
    val silverL1 = snapshot("silver/lineitem")
    val stations1 = snapshot("silver/stations")
    assert(goldCount1._1 > 0)
    // gold row per silver order
    assert(goldCount1._1 == silverO1._1)
    // bronze has 1 append of each raw row
    assert(table("bronze/orders").count() == silverO1._1)

    Pipeline.run(spark, sf, work) // re-run: bronze doubles, silver/gold stable

    assert(table("bronze/orders").count() == 2 * silverO1._1,
      "bronze should append on re-run (reference semantics)")
    assert(snapshot("silver/orders") == silverO1)
    assert(snapshot("silver/lineitem") == silverL1)
    assert(snapshot("silver/stations") == stations1)
    assert(snapshot("gold/wide_orders") == goldCount1)
  }

  test("every unlabeled station gets the nearest labeled county") {
    import spark.implicits._
    val work = tmpDir("pipeline2")
    Pipeline.run(spark, "/root/testdata/sf0.001", work)
    val st = spark.read.parquet(s"$work/silver/stations")
    assert(st.filter($"county".isNull).count() == 0)
    assert(st.count() == 25) // all nation-derived stations present
  }
}
