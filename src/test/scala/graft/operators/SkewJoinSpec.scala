package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on skewed data") {
    import spark.implicits._
    // 90% of fact rows hit one hot key
    val fact = (0 until 5000).map { i =>
      (if (i % 10 == 0) i % 7 else 1, s"p$i", i.toDouble)
    }.toDF("k", "payload", "v")
    val dim = (0 until 7).map(k => (k, s"dim$k")).toDF("k", "dname")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "v", "dname")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    val plain = fact.join(dim, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), nSalts = 8, "inner")
    assert(canon(salted) == canon(plain))

    val plainLeft = fact.join(dim.filter($"k" =!= 1), Seq("k"), "left")
    val saltedLeft = SkewJoin.saltedJoin(fact, dim.filter($"k" =!= 1), Seq("k"), 8, "left")
    assert(
      saltedLeft.select("k", "payload", "v", "dname").collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap ==
      plainLeft.select("k", "payload", "v", "dname").collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("salts actually spread the hot key across sub-keys") {
    import spark.implicits._
    val fact = (0 until 1000).map(i => (1, i)).toDF("k", "i")
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(8)).cast("int"))
    val distinctSalts = salted.select("__graft_salt").distinct().count()
    assert(distinctSalts >= 6, s"hot key only spread over $distinctSalts salts")
  }
}
