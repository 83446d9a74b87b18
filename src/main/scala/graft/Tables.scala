package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §A).
  *
  * Every query function receives the scale-factor directory at call time, so
  * the same plan builds at sf0.001 (smoke), sf0.01 (correctness) and sf0.1
  * (bench) — and, on a real cluster, at any path. Scans are plain parquet
  * reads: Catalyst handles column pruning and predicate pushdown into the
  * scan (verify via `PushedFilters` in `.explain("formatted")`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet has carried two physical types for `ts` across testdata
    * generations: TIMESTAMP(NANOS) — which Spark 4's parquet reader rejects
    * natively, so it is read as long (legacy conf) and truncated to
    * microsecond timestamps (identical to DuckDB's ns→µs cast) — and plain
    * TIMESTAMP(MICROS), which reads as a timestamp directly. Dispatch on the
    * observed type so both generations load identically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral division: double division would round the microsecond up
        // for some nanosecond values and diverge from DuckDB's truncation
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // downstream operators (windows, unix_timestamp, oracle hashing) were
        // written against TIMESTAMP; with UTC session semantics (SURVEY §7.4)
        // the NTZ→LTZ cast is value-identical
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
