package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what standing-index tag compaction buys at a daily-ingest
  * cadence: N tag partitions vs archive + recent, in file count, listing
  * surface, and warm check() wall time. Backs the SCALING.md round-11
  * figures.
  *
  * Usage: runMain graft.tools.CompactionProbe [nTags]
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val nTags = args.headOption.map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def oneBand(docs: org.apache.spark.sql.DataFrame) =
      docs.where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))

    val base = s"/tmp/graft_scratch/compaction_probe"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)
    val idx = new graft.dedup.StandingDedupIndex(spark, base, oneBand)
    (1 to nTags).foreach { t =>
      idx.ingest((0 until 200).map(i =>
        ((t * 10000 + i).toLong, s"doc $t $i body")).toDF("doc_id", "text"), tag = t)
    }
    val probe = (0 until 50).map(i =>
      ((10000 + i).toLong, s"doc 1 $i body")).toDF("doc_id", "text")

    def files() = idx.indexTable.read.inputFiles.length
    def dirs() = idx.indexTable.read.inputFiles
      .map(_.split('/').dropRight(1).mkString("/")).distinct.length
    def checkMs(): Long = {
      idx.check(probe).collect() // warm
      val t0 = System.nanoTime()
      idx.check(probe).collect()
      (System.nanoTime() - t0) / 1000000
    }

    println(f"[probe] before: tags=$nTags files=${files()} dirs=${dirs()} check_ms=${checkMs()}")
    idx.compactThrough(nTags - 2)
    println(f"[probe] after:  archive+2 files=${files()} dirs=${dirs()} check_ms=${checkMs()}")
    spark.stop()
  }
}
