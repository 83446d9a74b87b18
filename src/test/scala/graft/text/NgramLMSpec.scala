package graft.text

import graft.SparkSpec

class NgramLMSpec extends SparkSpec {

  test("corpus-typical text scores lower NLL than gibberish") {
    import spark.implicits._
    val corpus = (0 until 50).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and then the other dog sleeps"))
      .toDF("doc_id", "text")
    val model = NgramLM.train(corpus, "text")
    val probes = Seq(
      (100L, "the brown dog jumps over the lazy fox and sleeps"), // typical
      (101L, "zxq wvk pjq xxj qqz kkw jjx zzq wwk")               // gibberish
    ).toDF("doc_id", "text")
    val scores = NgramLM.score(probes, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(100L) < scores(101L),
      s"typical ${scores(100L)} should beat gibberish ${scores(101L)}")
    assert(scores(100L) > 0 && scores(101L) > 0)
  }

  test("scoring is deterministic and covers every document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = NgramLM.selfScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = NgramLM.selfScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)
    assert(s1.size == docs.count())
  }
}
