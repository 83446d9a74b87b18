package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Parquet-backed table with the Delta-table maintenance semantics the
  * reference exercises (SURVEY.md §2.2 K1-K4, §7.1 — no Delta jars ship in
  * this environment, so the table layer is reimplemented natively).
  *
  * Layout: a directory of parquet files, optionally hive-partitioned
  * (`partitionBy`, reference partitions every fact table on the ingest batch
  * key `data_block_id`, `bronze_table_creation.py:26` et al.). Reads always
  * pass `mergeSchema=true` so schema evolution across appends (the
  * reference's `.option('mergeSchema','true')`, K1) round-trips.
  *
  * Scale notes:
  *   - append/overwrite are plain distributed parquet writes — no driver
  *     bottleneck, any partition count.
  *   - merge is one full-outer shuffle join (see [[MergeOps]]) followed by a
  *     distributed rewrite. Partition pruning applies on the read side when
  *     the merge keys include the partition key.
  *   - the directory swap at the end of merge/overwrite is atomic per
  *     rename on HDFS-like filesystems; on object stores it is
  *     copy+delete. Single-writer assumption, documented (SURVEY.md §7.4) —
  *     the reference's Airflow DAG is also strictly linear.
  */
final class MedallionTable(
    val spark: SparkSession,
    val path: String,
    val partitionColumns: Seq[String] = Nil) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Exception-free existence dispatch replacing the reference's
    * `try: save(mode='error') except: merge` control flow
    * (`silver_table_creation.py:43-66`, SURVEY.md §3.4).
    */
  def exists: Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def read: DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  private def writer(df: DataFrame, mode: SaveMode) = {
    val w = df.write.mode(mode)
    if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w
  }

  /** K1 — append with schema merge + partitioning. */
  def append(df: DataFrame): Unit = writer(df, SaveMode.Append).parquet(path)

  /** K2 — full replace (static dims, `bronze_table_creation.py:36,61`). */
  def overwrite(df: DataFrame): Unit = writer(df, SaveMode.Overwrite).parquet(path)

  /** K3 — first-run create, error if the table already exists. */
  def createOrError(df: DataFrame): Unit =
    writer(df, SaveMode.ErrorIfExists).parquet(path)

  /** K4 — 3-clause merge (see [[MergeOps.merge3Clause]]): materializes the
    * merged result next to the table, then swaps directories.
    */
  def merge(
      source: DataFrame,
      keys: Seq[String],
      updateCondition: Option[(DataFrame, DataFrame) => Column] = None,
      deleteNotMatchedBySource: Boolean = true): Unit = {
    val merged = MergeOps.merge3Clause(read, source, keys, updateCondition, deleteNotMatchedBySource)
    val tmp = s"${path}__graft_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
    val w = merged.write.mode(SaveMode.Overwrite)
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w).parquet(tmp)
    val dst = new Path(path)
    val src = new Path(tmp)
    fs.delete(dst, true)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"merge swap failed: $tmp -> $path")
  }

  /** The reference's canonical upsert entry (`silver_table_creation.py:43-66`):
    * create on first run, 3-clause merge with the dynamic any-column-differs
    * update condition on re-runs.
    */
  def createOrMerge(source: DataFrame, keys: Seq[String]): Unit =
    if (!exists) createOrError(source)
    else merge(source, keys, Some(MergeOps.anyColumnDiffers(_, _, keys)))
}

object MedallionTable {
  def apply(spark: SparkSession, path: String, partitionColumns: Seq[String] = Nil): MedallionTable =
    new MedallionTable(spark, path, partitionColumns)
}
