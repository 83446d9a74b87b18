package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum ≡ the single-partition global window, and the
  * plan actually spreads work over multiple partitions.
  */
class PrefixSumSpec extends SparkSpec {

  test("runningTotal matches the global-window cumsum exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(50))).toDF("k", "v")
    val expected = df
      .withColumn("cum", sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = PrefixSum.runningTotal(df, "k", "v", "cum", numBuckets = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("work is spread over the requested partitions (no global funnel)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, 1)).toDF("k", "v")
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", numBuckets = 8)
    assert(out.rdd.getNumPartitions >= 4, "cumsum must not collapse to one partition")
  }
}
