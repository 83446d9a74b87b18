package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions) to a `(SparkSession, sfDir) =>
  * DataFrame`; `oracleSql` carries the equivalent DuckDB SQL over the same
  * parquet tables. Column names are aligned pairwise (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.5 M0) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.wideTable(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.defs, Relational.oracles),
      (AggQueries.defs, AggQueries.oracles),
      (SinkQueries.defs, SinkQueries.oracles),
      (GeoSimQueries.defs, GeoSimQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (PipelineOpsQueries.defs, PipelineOpsQueries.oracles),
      (HeadlineQueries.defs, HeadlineQueries.oracles),
      (TpchDeepQueries.defs, TpchDeepQueries.oracles),
      (ScalarQueries.defs, ScalarQueries.oracles),
      (WindowSetQueries.defs, WindowSetQueries.oracles),
      (AdvancedJoinQueries.defs, AdvancedJoinQueries.oracles),
      (GraphQueries.defs, GraphQueries.oracles),
      (Flagship.defs, Flagship.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver runs rows-only checks.
    */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
