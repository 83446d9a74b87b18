package graft.tools
import org.apache.spark.sql.SparkSession

/** Targeted correctness dump: `runMain graft.tools.VerifyOne <sfDir>
  * <outDir> <query>...` writes just the named SparkEntry queries (plus
  * their oracle_sql.json) so `scripts/selfcheck.py <outDir> <sfDir>`
  * checks them in isolation — the fast loop for verifying a NEW query
  * without the full graft.Verify catalog run.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    val json = names.map(n => "\"" + n + "\": " +
      "\"" + graft.SparkEntry.oracleSql(n).replace("\\", "\\\\")
        .replace("\"", "\\\"").replace("\n", "\\n") + "\"")
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
