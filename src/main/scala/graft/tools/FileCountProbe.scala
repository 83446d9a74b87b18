package graft.tools

import org.apache.spark.sql.SparkSession
import graft.table.{BloomIndex, MedallionTable, TableStats}

/** Driver-side metadata at EXTREME file counts (the 100 TB read-path
  * analog of the amendment-batch fix): [[TableStats.prunedFiles]] and
  * [[BloomIndex]] collect the (file, bounds) manifest to the driver —
  * file-count-proportional and previously unmeasured above ~10³ files.
  * This probe grows one table through 1k → 8k → 32k files (tiny rows;
  * file count is the variable) and times, at each size:
  *
  *   - listing (`read.inputFiles`) — the baseline every op pays
  *   - stats refresh (one pass, manifest build)
  *   - `prunedFiles` alone (manifest scan + driver collect)
  *   - `readRange` end-to-end (pruning + pruned data scan)
  *   - bloom build + bloom-pruned lookup
  *
  * Super-linear growth or driver-memory risk at the top size = the
  * curve bend to fix; near-linear with small constants = recorded
  * headroom. Usage: runMain graft.tools.FileCountProbe [maxFiles]
  */
object FileCountProbe {
  def main(args: Array[String]): Unit = {
    val maxFiles = args.headOption.map(_.toInt).getOrElse(32000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ms[T](f: => T): (T, Long) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1_000_000L)
    }

    for (n <- Seq(1000, 8000, maxFiles).distinct.filter(_ <= maxFiles)) {
      val p = java.nio.file.Files.createTempDirectory(s"fcp_$n")
        .toString + "/t"
      val t = MedallionTable(spark, p)
      // n files of ~4 rows each, id-clustered per file so range pruning
      // has real selectivity at every size
      t.overwrite((0 until n * 4).map(i => (i.toLong, s"v$i"))
        .toDF("id", "s")
        .repartitionByRange(n, org.apache.spark.sql.functions.col("id")))
      val (nf, listMs) = ms(t.read.inputFiles.length)
      val (_, refreshMs) = ms(t.refreshStats())
      val schema = t.read.schema
      val (pruned, pruneMs) = ms(TableStats.prunedFiles(spark, p,
        Seq(("id", Some(100L), Some(200L))), schema).map(_.size).getOrElse(-1))
      val (cnt, rangeMs) = ms(t.readRange("id", 100L, 200L).count())
      val (_, bloomBuildMs) = ms(BloomIndex.build(spark, p, "id",
        expectedItemsPerFile = 8L))
      val (bloomSel, bloomMs) = ms(BloomIndex.prunedFiles(spark, p, "id",
        Seq(150L), org.apache.spark.sql.types.LongType)
        .map(_.size).getOrElse(-1))
      val (_, bloomWarmMs) = ms(BloomIndex.prunedFiles(spark, p, "id",
        Seq(151L), org.apache.spark.sql.types.LongType)
        .map(_.size).getOrElse(-1))
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
      println(f"files=$nf%6d  list=${listMs}%5d ms  refresh=${refreshMs}%6d ms  " +
        f"prunedFiles=${pruneMs}%5d ms ($pruned kept)  " +
        f"readRange=${rangeMs}%5d ms ($cnt rows)  " +
        f"bloomBuild=${bloomBuildMs}%6d ms  bloomPrune=${bloomMs}%5d ms " +
        f"(warm ${bloomWarmMs} ms, $bloomSel kept)  heap=${heapMb} MB")

      // round-18 rows: the two table-root walks the r17 verdict flagged
      // as still on fs.listFiles(recursive) — CDF feed read
      // (dataFileIndex over the table root) and COPY INTO's landing
      // scan (O(source files) EVERY run; the no-op re-run isolates it)
      locally {
        import org.apache.spark.sql.functions.col
        t.enableChangeDataFeed()
        val en = t.commitVersion
        t.deleteVectored(col("id") % 997 === 0)
        val (feedRows, feedMs) = ms(t.readChangeFeed(en + 1).count())
        val tgt = MedallionTable(spark,
          java.nio.file.Files.createTempDirectory(s"fcp_ci_$n").toString + "/t")
        val (r1, copyMs) = ms(graft.table.CopyInto.copyInto(tgt, p))
        val (r2, noopMs) = ms(graft.table.CopyInto.copyInto(tgt, p))
        println(f"files=$nf%6d  cdfFeedRead=${feedMs}%6d ms ($feedRows rows)  " +
          f"copyInto=${copyMs}%6d ms (${r1.filesLoaded} files)  " +
          f"copyNoop=${noopMs}%6d ms (${r2.filesLoaded} files)")
      }
    }
    spark.stop()
  }
}
