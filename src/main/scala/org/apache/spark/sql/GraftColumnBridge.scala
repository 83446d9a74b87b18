package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions whose
  * constructor arguments aren't SQL-expressible (e.g. a scoring model map),
  * so function-registry builders can't produce them. Lives in the Spark
  * namespace solely to reach the `private[sql]` converters — the standard
  * extension-library pattern (cf. DatasetFactory in Qbeast, SNIPPETS.md [3]).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an already-analyzed logical plan — how the SQL DML
    * bridge re-executes a MERGE source plan (`Dataset.ofRows` is
    * `private[sql]`, same justification as the converters above).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an InternalRow RDD with the STREAMING tag set — the
    * v1 `Source.getBatch` contract (MicroBatchExecution asserts returned
    * frames are isStreaming). `internalCreateDataFrame` is
    * `private[sql]`, same justification as the converters above.
    */
  def streamingDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Batch (isStreaming = false) DataFrame over an InternalRow RDD — the
    * v1 `Sink.addBatch` re-anchor, ForeachBatchSink's own pattern: the
    * incoming micro-batch frame is streaming-tagged, so DataFrame
    * actions/writes on it refuse with "must be executed with
    * writeStream.start()".
    */
  def batchDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Re-executes every cached entry containing a sub-plan `sameResult` to
    * `plan` — the invalidation SQL DML owes CACHE TABLE users (the cache
    * manager is reachable only through the classic session's shared
    * state).
    */
  def recacheByPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.sharedState.cacheManager.recacheByPlan(cs, plan)
  }

  /** Hive-layout partition-segment unescape (`%XX` decoding) — Spark's
    * own codec, so footer-derived partition values match what a
    * partition-aware scan reconstructs (TableStats.footerStatsRows).
    */
  def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(s)
}
