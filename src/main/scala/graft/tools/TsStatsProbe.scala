package graft.tools

import org.apache.spark.sql.SparkSession

/** Does the per-write parquet option `outputTimestampType` work on this
  * Spark build (vs the session conf), and do INT64-micros timestamp chunks
  * carry usable min/max while INT96 ones do not? Diagnostic for the
  * footer-stats timestamp gate.
  */
object TsStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2021-06-15 12:34:56"))
    ).toDF("id", "ts")
    def describe(dir: String): Unit = {
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath),
          spark.sparkContext.hadoopConfiguration))
      try {
        val md = r.getFooter
        println(s"[ts] $dir schema: " +
          md.getFileMetaData.getSchema.toString.replace('\n', ' '))
        md.getBlocks.forEach(b => b.getColumns.forEach { c =>
          println(s"[ts]   col=${c.getPath} type=${c.getPrimitiveType} " +
            s"stats=${Option(c.getStatistics).map(s =>
              s"nulls=${s.getNumNulls} hasMinMax=${s.hasNonNullValue}")}")
        })
      } finally r.close()
    }
    df.write.mode("overwrite").parquet("/tmp/tsprobe/default")
    describe("/tmp/tsprobe/default")
    df.write.option("outputTimestampType", "TIMESTAMP_MICROS")
      .mode("overwrite").parquet("/tmp/tsprobe/opt")
    describe("/tmp/tsprobe/opt")
    df.write.option("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .mode("overwrite").parquet("/tmp/tsprobe/optfull")
    describe("/tmp/tsprobe/optfull")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    df.write.mode("overwrite").parquet("/tmp/tsprobe/conf")
    describe("/tmp/tsprobe/conf")
    spark.stop()
  }
}
