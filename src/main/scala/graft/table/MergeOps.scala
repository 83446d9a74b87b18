package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure (no I/O) implementation of the reference's 3-clause Delta MERGE as a
  * DataFrame→DataFrame transform, so the semantics are unit-testable and can
  * be exposed as an oracle-checked query.
  *
  * Reference shape (`silver_table_creation.py:57-66` and 6 more sites,
  * SURVEY.md §2.2 K4):
  *
  *   whenMatchedUpdate(condition = any column differs, set = all source cols)
  *   whenNotMatchedInsert(values = all source cols)
  *   whenNotMatchedBySourceDelete()
  *
  * Spark-first design: a single full-outer shuffle join on the merge keys,
  * column resolution with `when(...)`, and a row filter for the delete
  * clause. At 100 TB this is one shuffle of each side keyed on the merge
  * keys — the same cost profile as Delta's join-based merge — and it stays
  * entirely inside whole-stage codegen (no UDFs). When the target is
  * hive-partitioned on an ingest-batch key the scan prunes to touched
  * partitions before the join.
  */
object MergeOps {

  private val SrcMark = "__graft_src_present"
  private val TgtMark = "__graft_tgt_present"

  /** Replicates the reference's dynamic change-condition synthesis
    * (`silver_table_creation.py:50-54` et al., SURVEY.md §2.2 K5): OR over
    * all non-key columns of `destination.c <> source.c`. Null-unsafe `<>`
    * on purpose — the reference guarantees no nulls via dropna first
    * (SURVEY.md §7.4).
    */
  def anyColumnDiffers(tgt: DataFrame, src: DataFrame, keys: Seq[String]): Column = {
    val shared = tgt.columns.toSeq.filterNot(keys.contains).filter(src.columns.contains)
    if (shared.isEmpty) lit(false)
    else shared.map(c => tgt(c) =!= src(c)).reduce(_ || _)
  }

  /** 3-clause merge of `source` into `target` keyed on `keys`.
    *
    * @param updateCondition matched-row update gate built from the two
    *        aliased frames (e.g. `anyColumnDiffers`); None = update all
    *        matched rows (equivalent under the delete clause).
    * @param deleteNotMatchedBySource reference merges always pass true
    *        (full target↔source sync); false gives plain upsert.
    *
    * Schema evolution: columns present on only one side are null-padded,
    * mirroring Delta's `mergeSchema` behavior (SURVEY.md §1.2).
    */
  def merge3Clause(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCondition: Option[(DataFrame, DataFrame) => Column] = None,
      deleteNotMatchedBySource: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")

    val allCols: Seq[String] =
      target.columns.toSeq ++ source.columns.toSeq.filterNot(target.columns.contains)

    def pad(df: DataFrame, mark: String): DataFrame = {
      val padded = allCols.foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
      }
      padded.withColumn(mark, lit(true))
    }

    val t = pad(target, TgtMark).alias("t")
    val s = pad(source, SrcMark).alias("s")

    val joinCond = keys.map(k => t(k) === s(k)).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val srcPresent = s(SrcMark).isNotNull
    val tgtPresent = t(TgtMark).isNotNull
    val updCond = updateCondition.map(f => f(t, s)).getOrElse(lit(true))

    val resolved = allCols.map { c =>
      when(srcPresent && tgtPresent, when(updCond, s(c)).otherwise(t(c)))
        .when(srcPresent && !tgtPresent, s(c))   // whenNotMatchedInsert
        .otherwise(t(c))                         // not matched by source
        .as(c)
    }

    val kept =
      if (deleteNotMatchedBySource) joined.filter(srcPresent) // delete clause
      else joined

    kept.select(resolved: _*)
  }
}
