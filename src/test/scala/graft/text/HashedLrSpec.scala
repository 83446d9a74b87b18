package graft.text

import graft.SparkSpec

/** Hashed-feature LR training: separability, margins, and the degenerate
  * corners a training loop must not fall over.
  */
class HashedLrSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def planted(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val cls = i % 2 == 0
      val phrase = if (cls) "alpha beta gamma" else "delta epsilon zeta"
      (i.toLong, cls, s"$phrase $phrase $phrase noise$i")
    }.toDF("doc_id", "y", "text")
  }

  test("separable corpus trains to zero training error with O(1) margins") {
    val docs = planted(60)
    val m = HashedLr.train(docs, "doc_id", "text", "y")
    val got = HashedLr.predict(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id").as("did"), col("y")), "did")
      .select("did", "y", "predicted", "margin").collect()
    assert(got.length == 60)
    got.foreach { r =>
      assert(r.getAs[Boolean]("predicted") == r.getAs[Boolean]("y"),
        s"doc ${r.getAs[Long]("did")} misclassified")
      assert(math.abs(r.getAs[Double]("margin")) > 0.1,
        s"doc ${r.getAs[Long]("did")} margin too thin: ${r.getAs[Double]("margin")}")
    }
  }

  test("class-imbalanced corpus still separates") {
    import spark.implicits._
    val docs = (0 until 50).map { i =>
      val cls = i % 10 == 0 // 5 positives, 45 negatives
      val phrase = if (cls) "good stuff here" else "bad junk there"
      (i.toLong, cls, s"$phrase $phrase")
    }.toDF("doc_id", "y", "text")
    // imbalance slows full-batch convergence (the bias races negative
    // before the rare-class weights catch up) — more steps, hotter rate
    val m = HashedLr.train(docs, "doc_id", "text", "y",
      iterations = 60, learningRate = 2.0)
    val wrong = HashedLr.predict(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id").as("did"), col("y")), "did")
      .filter(col("predicted") =!= col("y")).count()
    assert(wrong == 0)
  }

  test("token-less documents are skipped in train and predict") {
    import spark.implicits._
    val docs = Seq((0L, true, "alpha alpha"), (1L, false, "beta beta"),
      (2L, true, "   ")).toDF("doc_id", "y", "text")
    val m = HashedLr.train(docs, "doc_id", "text", "y", iterations = 5)
    assert(HashedLr.predict(docs, "doc_id", "text", m).count() == 2)
  }

  test("empty corpus fails fast") {
    import spark.implicits._
    val docs = Seq((0L, true, " ")).toDF("doc_id", "y", "text")
    val e = intercept[IllegalArgumentException](
      HashedLr.train(docs, "doc_id", "text", "y", iterations = 1))
    assert(e.getMessage.contains("no tokenizable"))
  }

  test("decisions are stable across two independent trainings") {
    val docs = planted(40)
    val m1 = HashedLr.train(docs, "doc_id", "text", "y")
    val m2 = HashedLr.train(docs, "doc_id", "text", "y")
    val p1 = HashedLr.predict(docs, "doc_id", "text", m1)
      .select("did", "predicted").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val p2 = HashedLr.predict(docs, "doc_id", "text", m2)
      .select("did", "predicted").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(p1 == p2)
  }
}
