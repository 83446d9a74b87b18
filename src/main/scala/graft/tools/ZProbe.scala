package graft.tools
import org.apache.spark.sql.SparkSession
import graft.table.MedallionTable
object ZProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[zprobe] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = "/tmp/graft_scratch/zprobe"
    graft.queries.Q.deleteDir(spark, p)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val mt = MedallionTable(spark, p)
    t("overwrite")(mt.overwrite(li))
    t("compactZOrder")(mt.compactZOrder(Seq("l_orderkey", "l_partkey")))
    spark.sql("DROP TABLE IF EXISTS zprobe_t")
    spark.sql(s"CREATE TABLE zprobe_t USING graft LOCATION '$p'")
    t("select")(spark.sql("SELECT * FROM zprobe_t WHERE l_orderkey BETWEEN 500 AND 2500 AND l_partkey BETWEEN 100 AND 900").queryExecution.toRdd.foreach(_=>()))
    spark.stop()
  }
}
