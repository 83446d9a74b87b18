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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4's parquet reader
    * rejects natively: read nanos as long (legacy conf) and truncate to
    * microsecond timestamps (identical to DuckDB's ns→µs cast).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integral division: double division would round the microsecond up for
    // some nanosecond values and diverge from DuckDB's exact truncation
    load(spark, dir, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
