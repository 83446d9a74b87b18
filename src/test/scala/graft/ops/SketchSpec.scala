package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy bounds for the approximate sketches (their correctness proof —
  * approx values have no cross-engine oracle).
  */
class SketchSpec extends SparkSpec {
  test("HLL distinct counts within 5% and approx median within 2% of exact") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val exactD = li.select(countDistinct($"l_orderkey")).head().getLong(0)
    val approxD = li.select(approx_count_distinct($"l_orderkey")).head().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL: $approxD vs $exactD")

    val exactM = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approxM = li.select(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000))).head().getDouble(0)
    assert(math.abs(approxM - exactM) / exactM < 0.02,
      s"median: $approxM vs $exactM")
  }
}
