package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "events", "embeddings", "documents")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      println(s"== $t: ${df.schema.simpleString}")
    }
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
    ev.selectExpr("ts", "date_trunc('second', ts) as ts_s", "hour(ts) as h").show(3, false)
    println("== ts type after convert: " + ev.schema("ts").dataType)
    ev.select(round(lit(2.675), 2).as("a"), round(lit(12345.65), 1).as("b"), round(lit(0.5), 0).as("c")).show(2)
    spark.stop()
  }
}
