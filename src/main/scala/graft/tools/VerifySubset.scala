package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps a NAMED SUBSET of the registered queries in graft.Verify's output
  * format (result parquet per query + oracle_sql.json restricted to the
  * subset), so `scripts/selfcheck.py <outDir> <sfDir>` gives the oracle
  * verdict on just the queries under development — the fast loop while
  * adding catalog entries, without paying a full Verify run.
  *
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <query> [query ...]
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySubset <sfDir> <outDir> <query> [query ...]")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // mirror graft.Verify: execution under INT64-micros timestamps...
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LogNoise.silenceExpected()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // ...but the DUMP keeps the legacy INT96 encoding (graft.Verify's
      // rationale: DuckDB reads INT64 instant ts as TIMESTAMPTZ, which
      // the oracle's naive-TIMESTAMP compare mis-flags)
      val frame = fn(spark, sfDir)
      val k = "spark.sql.parquet.outputTimestampType"
      spark.conf.set(k, "INT96")
      try frame.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      finally spark.conf.set(k, "TIMESTAMP_MICROS")
      println(s"[subset] dumped $name")
    }
    val oracle = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    // same escape rules as Verify: control chars in builder SQL must not
    // corrupt the JSON
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = oracle.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
