package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Which Spark jobs does constructing `read` on a DV'd table run after the
  * schema memo was seeded and carried through the DV commits? Diagnostic
  * for the claim-carry work.
  */
object DvReadJobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.table._
    val p = "/tmp/dvreadprobe/t1"
    graft.queries.Q.deleteDir(spark, p)
    graft.queries.Q.deleteDir(spark, p + "__graft_commits")
    val t = MedallionTable(spark, p)
    t.overwrite((0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    t.read.schema
    t.updateVectored($"id" % 10 === 1, Map("s" -> lit("upd")))
    t.deleteVectored($"id" % 25 === 3)
    val sites = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        sites.synchronized {
          sites += j.stageInfos.lastOption.map(si => si.name + " || " +
            si.details.linesIterator.take(6).mkString(" <- ")).getOrElse("?")
          ()
        }
    })
    t.read.schema
    Thread.sleep(700)
    sites.synchronized(sites.foreach(s => println("[job] " + s.take(400))))
    spark.stop()
  }
}
