package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: each left row matches the right row with
  * the greatest `rightTime <= leftTime` within the same key — the standard
  * time-series enrichment operator (market data, feature stores).
  *
  * Scale shape: NOT a per-row range probe (that's an O(n·m) theta join in
  * Spark). Union both streams tagged, ONE shuffle+sort on (key, time, tag)
  * and a running `last(value, ignoreNulls)` window carries the most recent
  * right-hand values forward into each left row — linear in rows, same cost
  * as any windowed aggregation, AQE-skew-splittable on the key.
  *
  * Right rows must be unique per (key, time) — pre-aggregate to make the
  * match deterministic (callers pick the reduction; ties at the same
  * timestamp have no inherent order).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side, unique per (key, time)
    * @param keyCols    equality keys present in both
    * @param timeCol    ordering column name, present in both
    * @param payloadCols right-side value columns to carry (emitted as-is,
    *                    null when no right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")

    // tag 0 = right, 1 = left: at equal time the right row sorts first, so
    // `time >= rightTime` is inclusive (ASOF JOIN convention).
    //
    // The payload travels as ONE struct column, not per-column: a right row's
    // struct is non-null even when individual payload FIELDS are null, so a
    // single last(ignoreNulls) carries the whole matched row atomically.
    // Per-column carries would skip a legitimately-null field and splice in
    // an older row's value — mixing payload values from different right rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val taggedRight = right
      .select((keyCols :+ timeCol).map(col)
        :+ struct(payloadCols.map(col): _*).as("__payload"): _*)
      .withColumn("__tag", lit(0))
      .withColumns(leftCols.filterNot((keyCols :+ timeCol).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val taggedLeft = left.withColumn("__tag", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col)
        ++ payloadCols.map(c => col("__carried").getField(c).as(c)): _*)
  }

  /** Range join against a (typically small) table of [lo, hi) intervals:
    * broadcast the interval side so the probe is a narrow map over the big
    * side, not a shuffle theta-join. For large interval sets, bucketize
    * both sides on a range grid first (not needed at this cardinality).
    */
  def rangeJoinBroadcast(big: DataFrame, ranges: DataFrame,
      valueCol: Column, loCol: Column, hiCol: Column): DataFrame =
    big.join(broadcast(ranges), valueCol >= loCol && valueCol < hiCol, "left")
}
