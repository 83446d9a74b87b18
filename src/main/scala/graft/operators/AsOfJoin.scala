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
      timeCol: String, payloadCols: Seq[String]): DataFrame =
    asOfDirected(left, right, keyCols, timeCol, payloadCols, forward = false)

  /** Forward as-of: each left row matches the right row with the SMALLEST
    * `rightTime >= leftTime` within the same key (inclusive) — the
    * "next event" enrichment (next price tick, next maintenance window).
    * Same union + one-window shape as [[asOf]], just carried in reverse
    * time order; identical cost and skew profile.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payloadCols: Seq[String]): DataFrame =
    asOfDirected(left, right, keyCols, timeCol, payloadCols, forward = true)

  private def asOfDirected(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, payloadCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Descending time flips the carry to "nearest following"; the right
    // row still sorts before the left row at equal time (tag asc), so
    // the match stays inclusive in BOTH directions.
    val timeOrder = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedUnion(left, right, keyCols, timeCol, payloadCols)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col)
        ++ payloadCols.map(c => col("__carried").getField(c).as(c)): _*)
  }

  /** Hot-key-safe as-of join — same semantics as [[asOf]] (spec-pinned
    * equal on identical inputs), with the per-key running carry computed
    * in TWO window passes so a single hot key spreads over up to
    * `buckets` tasks instead of funneling into one straggler (AQE does
    * not skew-split window operators):
    *
    *  1. rows are range-bucketed on TIME within each key (bucket =
    *     position in the [min, max] span — row-local arithmetic, no
    *     ntile/global sort), and the running `last(ignoreNulls)` window
    *     runs within (key, bucket);
    *  2. a per-(key, bucket) boundary summary (the bucket's final right
    *     payload — at most `buckets` rows per key) is prefix-carried
    *     across buckets by a second window over those summary rows only,
    *     and patched under rows that precede their bucket's first right
    *     row (`coalesce(within-bucket carry, carry-in)`).
    *
    * Cost vs [[asOf]]: one extra tiny aggregation + a small equi-join
    * keyed identically to pass 1 (reuses its partitioning), plus one
    * 2-scalar min/max job up front to size the time grid (which makes
    * this entry EAGER — it runs a job at call time). Use when a key can
    * dominate the timeline; [[asOf]] is one shuffle cheaper when keys
    * are well-distributed.
    */
  def asOfSalted(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, payloadCols: Seq[String], buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val leftCols = left.columns.toSeq
    val u0 = taggedUnion(left, right, keyCols, timeCol, payloadCols)
    val bounds = u0
      .agg(min(col(timeCol).cast("double")), max(col(timeCol).cast("double")))
      .head()
    if (bounds.isNullAt(0)) // no rows at all — nothing to salt
      return asOf(left, right, keyCols, timeCol, payloadCols)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val width = (hi - lo) / buckets
    val bucket =
      if (width <= 0) lit(0) // single distinct time — one bucket
      else least(greatest(
        floor((col(timeCol).cast("double") - lit(lo)) / lit(width)), lit(0)),
        lit(buckets - 1)).cast("int")
    val u = u0.withColumn("__bucket", bucket)
    val keyB = keyCols :+ "__bucket"
    val wIn = Window.partitionBy(keyB.map(col): _*)
      .orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pass1 = u
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(wIn))
    // Boundary summaries: the final right payload per (key, bucket) —
    // right rows are unique per (key, time), so max_by is deterministic.
    val bucketLast = u.filter(col("__tag") === 0)
      .groupBy(keyB.map(col): _*)
      .agg(max_by(col("__payload"), col(timeCol)).as("__bucket_last"))
    // Prefix-carry across buckets: a window over AT MOST `buckets` rows
    // per key — the funnel the salt exists to avoid now touches summary
    // rows, not data rows.
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // NULL-SAFE equi-joins on (key, bucket): window partitioning groups
    // NULL keys (and a NULL bucket from a null time) into one partition
    // exactly like [[asOf]], so the carry joins must match them too — a
    // null-unsafe join would silently drop the carry-in for those rows
    // and break the semantics-equal contract.
    def nullSafeJoin(l: DataFrame, r: DataFrame, how: String): DataFrame = {
      val renamed = keyB.foldLeft(r)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
      val cond = keyB.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
      l.join(renamed, cond, how).drop(keyB.map(c => s"__r_$c"): _*)
    }
    val carry = nullSafeJoin(u.select(keyB.map(col): _*).distinct(), bucketLast, "left")
      .withColumn("__carry_in", last(col("__bucket_last"), ignoreNulls = true).over(wCarry))
      .select(keyB.map(col) :+ col("__carry_in"): _*)
    nullSafeJoin(pass1.filter(col("__tag") === 1), carry, "left")
      .withColumn("__final", coalesce(col("__carried"), col("__carry_in")))
      .select(leftCols.map(col)
        ++ payloadCols.map(c => col("__final").getField(c).as(c)): _*)
  }

  /** Tag-and-union prep shared by [[asOf]] and [[asOfSalted]].
    *
    * tag 0 = right, 1 = left: at equal time the right row sorts first, so
    * `time >= rightTime` is inclusive (ASOF JOIN convention).
    *
    * The payload travels as ONE struct column, not per-column: a right row's
    * struct is non-null even when individual payload FIELDS are null, so a
    * single last(ignoreNulls) carries the whole matched row atomically.
    * Per-column carries would skip a legitimately-null field and splice in
    * an older row's value — mixing payload values from different right rows.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
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
    taggedLeft.unionByName(taggedRight)
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
