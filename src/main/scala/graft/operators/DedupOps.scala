package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-frugal exact deduplication.
  *
  * `dropDuplicates()` plans an aggregate exchange hashed on ALL columns; a
  * pipeline that then writes partitioned by some column pays a SECOND
  * shuffle to restore the write layout. When one column is known to agree
  * across duplicates (here: any column of the row, e.g. the ingest batch
  * key), dedup can instead run inside a partitioning BY THAT COLUMN: sort
  * rows within each partition by all columns (identical rows become
  * adjacent — the sort spills, unlike a per-partition hash set) and drop
  * rows equal to their predecessor. Declarative lag/window form, so the
  * block-hash exchange is reused by the downstream partitioned write —
  * ONE shuffle for dedup + layout instead of two.
  *
  * Applicability: parallelism is bounded by `coPartitionCol`'s cardinality
  * (each partition sorts serially). Use when |distinct values| ≥ cluster
  * cores — e.g. date/batch keys on a real table. With a handful of
  * partitions, plain `dropDuplicates()` + repartition is faster despite
  * the extra shuffle.
  */
object DedupOps {

  /** Exact `dropDuplicates()` equivalent; `coPartitionCol` must be one of
    * the frame's columns (any column works — duplicates agree everywhere).
    */
  def dropDuplicatesSorted(df: DataFrame, coPartitionCol: String): DataFrame = {
    require(df.columns.contains(coPartitionCol),
      s"$coPartitionCol is not a column of the frame")
    val allCols = df.columns.toSeq
    val w = Window.partitionBy(col(coPartitionCol))
      .orderBy(allCols.map(col): _*)
    val sameAsPrev = allCols
      .map(c => lag(col(c), 1).over(w) <=> col(c))
      .reduce(_ && _)
    // row_number guard: for the first row of a partition every lag(c) is
    // null, and for an ALL-NULL row `null <=> null` then holds for every
    // column — without the guard that row would compare "equal to its
    // (nonexistent) predecessor" and all its copies would be dropped.
    // Same window spec, so both functions run in the single Window op.
    val dup = row_number().over(w) > 1 && sameAsPrev
    df.withColumn("__graft_dup", dup)
      .filter(!col("__graft_dup"))
      .drop("__graft_dup")
  }
}
