package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory for the graft engine: AQE on (default in
  * Spark 4, made explicit), shuffle parallelism sized to cores instead of
  * the 200 default, UTC semantics (SURVEY.md §7.4), and the graft SQL
  * functions (`graft_dot`/`graft_cosine`) registered.
  *
  * Library code never requires this — every operator works on any session
  * (queries register functions defensively) — but it is the one-liner a
  * user starts from.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // INT64 micros, not Spark's legacy INT96 default: INT96 is
      // deprecated in parquet-format and its chunk min/max use a broken
      // comparator readers must ignore (PARQUET-1065), so INT96 timestamp
      // columns can never arm footer stats or row-group skipping. Delta
      // and Iceberg write INT64 timestamps for the same reason.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).master(s"local[$cores]").getOrCreate()
    plans.GraftFunctions.register(s)
    s
  }
}
