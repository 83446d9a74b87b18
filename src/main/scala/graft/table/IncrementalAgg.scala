package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an algebraic grouped aggregate (COUNT +
  * SUMs) from a CDC change feed — the medallion gold-refresh that never
  * rescans the fact table.
  *
  * The reference recomputes its gold aggregates from the full silver
  * table on every pipeline run (gold_table_creation.py:103,134 rebuilds
  * the SQL aggregation end-to-end). That is O(fact) per refresh; at
  * 100 TB the fact scan dominates everything else the pipeline does. For
  * algebraic aggregates (COUNT, SUM — and anything derivable from them:
  * AVG, ratios) the classic delta-maintenance identity applies:
  *
  *   gold' = gold ⊕ Σ signed(changes)
  *
  * where inserts and update POST-images contribute +1 and deletes and
  * update PRE-images contribute −1. A row whose GROUP KEY moves is
  * handled for free: its preimage decrements the old group and its
  * postimage increments the new one. The refresh therefore costs one
  * shuffle of the CHANGE BATCH (O(batch)) plus an equi-join against the
  * gold table (O(groups)) — never a fact scan.
  *
  * Exactness contract: sum expressions should be integer-valued (e.g.
  * money in cents via `round(col * 100).cast("long")`). Integer deltas
  * are associative and cancel exactly, so an incrementally maintained
  * gold is BIT-IDENTICAL to a full recompute — which is exactly what the
  * spec and the `k9_incremental_gold` oracle assert. Floating-point sums
  * would drift by re-association order, as they do in any engine.
  */
object IncrementalAgg {

  /** Gold schema: groupCols ++ `n_rows` ++ one column per named sum. */
  def fullCompute(
      fact: DataFrame,
      groupCols: Seq[String],
      sums: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sums.map { case (name, e) => sum(e).as(name) }
    fact.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply a CDC batch (schema: fact columns + `_change_type` ∈ insert /
    * delete / update_preimage / update_postimage, the
    * [[MergeOps.merge3ClauseCDC]] feed) to a previously computed gold.
    * Result ≡ [[fullCompute]] over the post-change fact state.
    *
    * Scale shape: one hash aggregate over the change batch, then a
    * null-safe full-outer equi-join with gold on the group keys — both
    * sides are groups-sized after the aggregate. Groups whose row count
    * reaches zero disappear, matching the full recompute. An unknown
    * `_change_type` fails the job rather than silently skewing the sums.
    */
  def refresh(
      gold: DataFrame,
      changes: DataFrame,
      groupCols: Seq[String],
      sums: Seq[(String, Column)]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(
        lit("IncrementalAgg: unknown _change_type "), col("_change_type"))))
    val sumNames = sums.map(_._1)
    val deltaAggs = sum(col("__sign")).as("__d_n") +:
      sums.map { case (name, e) => sum(e * col("__sign")).as("__d_" + name) }
    val delta = changes
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      // rename keys so the join below has unambiguous sides
      .select(groupCols.map(k => col(k).as("__k_" + k)) ++
        ("__d_n" +: sumNames.map("__d_" + _)).map(col): _*)

    // NULL group keys are legitimate group values; plain equality would
    // fail to pair them, double-counting the group. <=> pairs them.
    val joinCond = groupCols
      .map(k => col(k) <=> col("__k_" + k))
      .reduce(_ && _)
    val joined = gold.join(delta, joinCond, "full_outer")

    val outKeys = groupCols.map(k => coalesce(col(k), col("__k_" + k)).as(k))
    val outN = (coalesce(col("n_rows"), lit(0L)) +
      coalesce(col("__d_n"), lit(0L))).as("n_rows")
    val outSums = sumNames.map { n =>
      (coalesce(col(n), lit(0L)) + coalesce(col("__d_" + n), lit(0L))).as(n)
    }
    joined
      .select((outKeys :+ outN) ++ outSums: _*)
      .filter(col("n_rows") =!= 0L)
  }

  /** The column a [[catchUp]]-managed gold uses to remember which fact
    * commit ordinal it reflects. A constant per version of the gold, it
    * commits atomically WITH the gold content (one table swap), which is
    * what makes the maintenance loop replay-safe and self-healing.
    */
  val FactCommitCol = "_fact_commit"

  /** Batch "REFRESH MATERIALIZED VIEW": bring `gold` up to `fact`'s
    * current state by refreshing from `fact.changesSinceOrdinal(reflected)`
    * — whatever happened to the fact since the state the gold reflects,
    * regardless of who wrote it or how many times this is re-run. A
    * missing/empty gold bootstraps with a full compute. This is the body
    * of [[graft.streaming.EventStreams.goldStream]]'s per-batch step,
    * exposed for cron-cadence refresh jobs.
    *
    * Change-source preference: when the fact's writer-captured change
    * data feed covers the gap ([[ChangeFeed]] — enabled, and every
    * commit in `(reflected, current]` captured), the refresh reads it at
    * O(changed rows); otherwise it falls back to
    * `fact.changesSinceOrdinal(reflected)`, the O(fact) snapshot diff,
    * which requires `retainVersions` to cover the refresh cadence. The
    * feed's rewrite rendering (delete-all + insert-all) is exactly
    * absorbed by the signed-delta algebra, so both sources maintain the
    * same gold bit-for-bit.
    */
  def catchUp(fact: MedallionTable, gold: MedallionTable,
      keys: Seq[String], groupCols: Seq[String],
      sums: Seq[(String, Column)]): Unit = {
    val reflected = // one row of one column — metadata-bounded driver read
      if (!gold.exists) None
      else gold.read.select(FactCommitCol).take(1).headOption.map(_.getLong(0))
    reflected match {
      case None =>
        gold.overwrite(fullCompute(fact.read, groupCols, sums)
          .withColumn(FactCommitCol, lit(fact.commitVersion)))
      case Some(ord) =>
        val (changes, head) = changesAndHead(fact, ord, keys)
        if (head != ord)
          gold.overwrite(
            refresh(gold.read.drop(FactCommitCol), changes, groupCols, sums)
              .withColumn(FactCommitCol, lit(head)))
    }
  }

  /** The change rows that turn `fact@ord` into the state at the returned
    * HEAD ordinal, paired with that head — the writer-captured feed when
    * it covers the gap (O(Δ)), else the snapshot diff (O(fact), needs
    * retention). The head is what the consumer must STAMP as reflected:
    * on the feed path it is [[ChangeFeed.capturedThrough]], NOT the raw
    * marker head — a claim-first writer's marker is visible before its
    * data and capture land, and stamping past it would silently skip
    * that commit's rows on the next refresh. `head == ord` ⟺ nothing new
    * (the returned frame is unspecified; skip the refresh). Shared by
    * [[IncrementalJoin.catchUp]] and the streaming refresh loops.
    */
  def changesAndHead(fact: MedallionTable, ord: Long,
      keys: Seq[String]): (DataFrame, Long) = {
    val viaFeed =
      if (!ChangeFeed.isEnabled(fact.spark, fact.path)) None
      else {
        val head = ChangeFeed.capturedThrough(fact)
        // head < ord happens when a previous refresh stamped via the
        // snapshot-diff fallback at the raw marker head while a crashed
        // writer's capture never landed: the captured-through witness
        // then trails the stamped ordinal. Nothing new from the FEED's
        // point of view — report "no change" at the stamped ordinal
        // (the consumer keeps its watermark; the gap's rows were already
        // absorbed by the fallback refresh that stamped it).
        if (head <= ord) Some((fact.read.limit(0), ord))
        else
          try Some((fact.readChangeFeed(ord + 1, head)
            .drop(ChangeFeed.CommitVersionCol, ChangeFeed.CommitTimestampCol),
            head))
          catch { // a refused range (uncaptured commit) falls back
            case _: IllegalStateException => None
            case _: IllegalArgumentException => None
          }
      }
    viaFeed.getOrElse(
      (fact.changesSinceOrdinal(ord, keys), fact.commitVersion))
  }
}
