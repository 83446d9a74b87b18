package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) sum over a total order — the scalable form
  * of `sum(...).over(Window.orderBy(key))`, which Spark executes in ONE
  * partition (every row shuffles to a single task: the classic global-window
  * bottleneck).
  *
  * Classic two-phase scan: bucket rows by quantile cuts of the order key
  * (a DATA-derived bucket column — deliberately not `spark_partition_id()`,
  * whose value depends on AQE's per-query coalescing and can differ between
  * the totals job and the output job), local cumsum per bucket (ordinary
  * partitioned window), then add each bucket's starting offset. Bucket
  * totals are |buckets| rows, so the offset scan is driver-side metadata,
  * not data. Result is identical to the global window when `orderCol` is
  * unique (required for a well-defined total order).
  *
  * `orderCol` must be numeric (quantile cuts); `valueCol` integral.
  */
object PrefixSum {

  /** Adds `outCol` = running total of `valueCol` in `orderCol` order
    * (inclusive of the current row).
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, numBuckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions)
    val cuts =
      if (n == 1) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, (1 until n).map(_.toDouble / n).toArray, 0.001)
    // bucket id = number of cuts strictly below the value — monotone in
    // orderCol, so bucket-major + in-bucket order is the global order
    val bucketExpr = cuts.distinct.map(c =>
      when(col(orderCol) > lit(c), 1).otherwise(0): org.apache.spark.sql.Column)
      .foldLeft(lit(0))(_ + _)
    val bucketed = df.withColumn("__graft_bucket", bucketExpr)
      .repartition(math.max(n, 1), col("__graft_bucket"))
    val w = Window.partitionBy(col("__graft_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // localCheckpoint: the totals job and the output job must read the SAME
    // materialization — recomputing from a nondeterministic source (sample,
    // shuffle-order-dependent dedup) could bucket rows differently per job
    // and misalign offsets; it also saves the second full compute.
    val local = bucketed.withColumn("__graft_local", sum(col(valueCol)).over(w))
      .localCheckpoint()
    // per-bucket totals: |buckets| rows — driver-side scan is metadata
    val totals = local.groupBy(col("__graft_bucket"))
      .agg(sum(col(valueCol)).cast("long").as("__graft_btot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0 -> 0L) { case ((_, acc), (b, tot)) =>
      b -> (acc + tot)
    }.init.zip(totals).map { case ((_, off), (b, _)) => b -> off }.toMap
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("__graft_bucket") === b, lit(off)).otherwise(acc)
    }
    local.withColumn(outCol, col("__graft_local") + offsetExpr)
      .drop("__graft_bucket", "__graft_local")
  }
}
