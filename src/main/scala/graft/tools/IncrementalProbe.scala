package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.table.IncrementalAgg

/** Scale evidence for [[graft.table.IncrementalAgg]]: times a FULL gold
  * recompute against an INCREMENTAL refresh from a fixed-size CDC batch,
  * at fact size 1× and `factor`×. The claim under test is the shape —
  * recompute is O(fact) (time grows with the factor) while refresh is
  * O(batch)+O(groups) (time stays flat as the fact grows, because the
  * refresh never reads the fact table at all; it reads the gold and the
  * change feed). Both paths are timed over cached inputs so the numbers
  * compare aggregation work, not disk.
  *
  * Usage: runMain graft.tools.IncrementalProbe [sfDir] [factor]
  */
object IncrementalProbe {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val grp = Seq("l_partkey")
    val sums = Seq(
      "qty_centi" -> round(col("l_quantity") * 100).cast("long"),
      "price_cents" -> round(col("l_extendedprice") * 100).cast("long"),
      "disc_bp" -> round(col("l_discount") * 10000).cast("long"),
      "tax_bp" -> round(col("l_tax") * 10000).cast("long"))
    val base = graft.Tables.lineitem(spark, sfDir)
      .withColumn("rid", monotonically_increasing_id())

    // All inputs read from PARQUET, as in production: the full recompute
    // pays the fact scan; the refresh reads only gold (groups-sized) and
    // the change feed (batch-sized). Caching would hide exactly the cost
    // the incremental path exists to avoid.
    def runAt(k: Int): (Double, Double, Long) = {
      val dir = graft.queries.Q.scratch(sfDir, s"incprobe_x$k")
      graft.queries.Q.deleteDir(spark, dir)
      (0 until k).map { i =>
        base.withColumn("rid", col("rid") + lit(i.toLong << 40))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/fact")
      val fact = spark.read.parquet(s"$dir/fact")
      val n = fact.count()
      // fixed-size change batch: 1% of the BASE table regardless of k —
      // updates (pre+post pairs with bumped quantity) plus inserts
      val batch = base.filter(col("rid") % 100 === 0)
      val pre = batch.withColumn("_change_type", lit("update_preimage"))
      val post = batch.withColumn("l_quantity", col("l_quantity") + 1)
        .withColumn("_change_type", lit("update_postimage"))
      val ins = batch.withColumn("rid", col("rid") + lit(1L << 60))
        .withColumn("_change_type", lit("insert"))
      pre.unionByName(post).unionByName(ins)
        .write.mode("overwrite").parquet(s"$dir/changes")
      val changes = spark.read.parquet(s"$dir/changes")
      IncrementalAgg.fullCompute(fact, grp, sums)
        .write.mode("overwrite").parquet(s"$dir/gold")
      val gold = spark.read.parquet(s"$dir/gold")
      def noop(df: DataFrame): Unit =
        df.queryExecution.toRdd.foreach(_ => ())
      val tFull = (1 to 3).map(_ =>
        time(noop(IncrementalAgg.fullCompute(fact, grp, sums)))).min
      val tInc = (1 to 3).map(_ =>
        time(noop(IncrementalAgg.refresh(gold, changes, grp, sums)))).min
      graft.queries.Q.deleteDir(spark, dir)
      (tFull, tInc, n)
    }

    runAt(1) // discarded: JIT + codegen warmup for both code paths
    val (fk, ik, nk) = runAt(factor)
    val (f1, i1, n1) = runAt(1)
    println(f"PROBE incremental_gold fact_rows=$n1 full=$f1%.2fs refresh=$i1%.2fs")
    println(f"PROBE incremental_gold fact_rows=$nk full=$fk%.2fs refresh=$ik%.2fs")
    println(f"PROBE ratios at ${factor}x: full=${fk / f1}%.2fx refresh=${ik / i1}%.2fx " +
      f"(flat refresh = the O(batch) claim)")
    spark.stop()
  }
}
