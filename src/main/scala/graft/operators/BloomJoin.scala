package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: build a bloom filter over the build side's
  * join key and filter the probe side BEFORE its shuffle. The final join
  * still runs (false positives are dropped there), so the result is exactly
  * the plain join — the win is shuffle volume: at 100 TB, a selective build
  * side means most probe rows are discarded at the scan instead of being
  * hashed, serialized and shuffled.
  *
  * This is the manual form of Spark's own runtime row-level filtering
  * (InjectRuntimeFilter), using the same Catalyst machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` over xxhash64) but
  * available unconditionally — no optimizer heuristics deciding whether the
  * filter is worth it. Exact results regardless of FPP.
  */
object BloomJoin {

  /** Inner equi-join with bloom-pruned probe side.
    *
    * @param estimatedItems sizing hint for the filter (bits scale with it)
    */
  def prunedInnerJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      estimatedItems: Long = 1000000L): DataFrame = {
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(build(buildKey)))),
      estimatedItems).toAggregateExpression()
    // one aggregation job; the driver holds only the filter's bit array
    // (same payload a broadcast-side runtime filter ships to executors)
    val bloomBytes = build
      .select(GraftColumnBridge.column(bloomAgg).as("bf"))
      .head().getAs[Array[Byte]](0)

    val mightContain = GraftColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        new XxHash64(Seq(GraftColumnBridge.expression(probe(probeKey))))))

    probe.filter(mightContain)
      .join(build, probe(probeKey) === build(buildKey))
  }
}
