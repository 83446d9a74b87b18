package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for incremental clustering
  * ([[graft.table.MedallionTable.clusterIncremental]]): is a maintenance
  * pass's cost FLAT in the already-clustered table size and LINEAR in the
  * new data — the property that makes clustering affordable on a 100 TB
  * append stream — and how does read pruning compare against one full
  * `compactZOrder`? Usage: runMain graft.tools.ClusterProbe <sfDir>
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.table._

    def timed[T](what: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cluster] $what%-56s $s%.3f s")
      (r, s)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_partkey").as("pk"),
        col("l_extendedprice").as("price"))
    val total = li.count()

    // Two tables: SMALL holds 1/4 of the rows already clustered, BIG all
    // of them — then the SAME fresh batch is appended to both and one
    // incremental pass timed. Flat-in-table-size means the two times
    // match; the rewrite alternative (compactZOrder) shows the O(table)
    // cost the pass avoids.
    val batch = li.filter(col("k") % 100 === 0)
    val batchRows = batch.count()
    println(s"[cluster] total rows: $total, new-batch rows: $batchRows")

    def mkClustered(name: String, frac: Int): MedallionTable = {
      val p = graft.queries.Q.scratch(sfDir, name)
      Seq(p, p + "__graft_commits")
        .foreach(graft.queries.Q.deleteDir(spark, _))
      val t = MedallionTable(spark, p)
      t.overwrite(if (frac == 1) li else li.filter(col("k") % frac === 1))
      t.clusterIncremental(Seq("k"), nFiles = 8)
      t
    }
    val small = mkClustered("cluster_probe_small", 4) // ~25% of rows
    val big = mkClustered("cluster_probe_big", 1)     // all rows
    println(s"[cluster] small table: ${small.read.count()} rows, " +
      s"big table: ${big.read.count()} rows")

    // warm the pass's code paths once so JIT/codegen warmup doesn't
    // masquerade as a table-size effect in the A/B
    val warm = mkClustered("cluster_probe_warm", 8)
    warm.append(batch)
    warm.clusterIncremental(Seq("k"), nFiles = 4)

    small.append(batch)
    big.append(batch)
    val (_, tSmall) =
      timed(s"incremental pass, SMALL table (+$batchRows rows)")(
        small.clusterIncremental(Seq("k"), nFiles = 4))
    val (_, tBig) =
      timed(s"incremental pass, BIG table   (+$batchRows rows)")(
        big.clusterIncremental(Seq("k"), nFiles = 4))
    println(f"[cluster] big/small pass ratio: ${tBig / tSmall}%.2f " +
      "(flat-in-table-size => ~1.0)")

    // pruning on the incremental layout, before the rewrites replace it
    val lo = 1000L; val hi = 2000L
    val pi = small.readRange("k", lo, hi)
    println(s"[cluster] small (incremental layout) range read: " +
      s"${pi.inputFiles.length} files of ${small.read.inputFiles.length}, " +
      s"${pi.count()} rows")

    // the O(table) alternative this replaces: the full rewrite's cost
    // GROWS with table size while the incremental pass's does not — the
    // crossover the per-pass floor hides at bench scale
    val (_, tFullSmall) = timed("full compactZOrder, SMALL table")(
      small.compactZOrder(Seq("k"), nFiles = 8))
    val (_, tFull) = timed("full compactZOrder, BIG table")(
      big.compactZOrder(Seq("k"), nFiles = 16))
    println(f"[cluster] full-rewrite big/small ratio: " +
      f"${tFull / tFullSmall}%.2f (O(table) => ~4.0) vs incremental " +
      f"${tBig / tSmall}%.2f (flat)")

    val pf = big.readRange("k", lo, hi)
    println(s"[cluster] big (full-rewrite layout) range read: " +
      s"${pf.inputFiles.length} files of ${big.read.inputFiles.length}, " +
      s"${pf.count()} rows")
    spark.stop()
  }
}
