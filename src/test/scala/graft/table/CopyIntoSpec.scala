package graft.table

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** COPY INTO semantics: incremental loading, idempotent re-runs, the
  * crash-recovery protocol on both sides of the data commit, and the log
  * surviving a table rewrite (OPTIMIZE).
  */
class CopyIntoSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def land(dir: String, name: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").withColumn("v", col("id") * 10)
      .coalesce(1).write.parquet(s"$dir/$name")
  }

  test("loads new files only; re-run is a no-op; later landings load incrementally") {
    val src = tmpDir("ci_src")
    val tp = tmpDir("ci_tbl")
    land(src, "b1", 1L to 5L)
    val t = MedallionTable(spark, tp)

    val r1 = CopyInto.copyInto(t, src)
    assert(r1.filesLoaded >= 1 && r1.rowsLoaded == 5L)
    assert(t.read.count() == 5L)

    val r2 = CopyInto.copyInto(t, src) // identical re-run
    assert(r2 == CopyInto.Result(0, 0L), "re-run must be a no-op")
    assert(t.read.count() == 5L)

    land(src, "b2", 6L to 8L) // a new landing beside the loaded one
    val r3 = CopyInto.copyInto(t, src)
    assert(r3.rowsLoaded == 3L, "only the new landing's rows load")
    assert(t.read.count() == 8L)
    assert(t.read.agg(sum("id")).head.getLong(0) == (1L to 8L).sum)
  }

  test("crash between data commit and log finalize: recovery completes the log, no double load") {
    val src = tmpDir("ci_crash_src")
    val tp = tmpDir("ci_crash_tbl")
    land(src, "b1", 1L to 4L)
    val t = MedallionTable(spark, tp)
    CopyInto.testFailpoint = {
      case "post-copy-commit" => throw new RuntimeException("injected crash")
      case _ => ()
    }
    try intercept[RuntimeException] { CopyInto.copyInto(t, src) }
    finally CopyInto.testFailpoint = _ => ()
    // the data COMMITTED before the crash; the log did not finalize
    assert(t.read.count() == 4L)
    assert(CopyInto.loadedFiles(spark, tp).isEmpty)
    // recovery (step 1 of the next run) finalizes instead of re-loading
    val r = CopyInto.copyInto(t, src)
    assert(r == CopyInto.Result(0, 0L), "recovered batch must not re-load")
    assert(t.read.count() == 4L, "no duplicate rows after recovery")
    assert(CopyInto.loadedFiles(spark, tp).nonEmpty)
  }

  test("stage-then-crash (no data commit): pending segment is discarded, files load once") {
    import spark.implicits._
    val src = tmpDir("ci_stage_src")
    val tp = tmpDir("ci_stage_tbl")
    land(src, "b1", 1L to 3L)
    val t = MedallionTable(spark, tp)
    // plant a pending segment by hand — the state a crash between STAGE
    // and COMMIT leaves (batch id absent from history)
    val pend = s"${tp}__graft_commits/copy_log_pending/dead-beef"
    val files = fs(src).listFiles(new Path(src), true)
    val b = Seq.newBuilder[String]
    while (files.hasNext) {
      val f = files.next().getPath
      if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
        b += fs(src).makeQualified(f).toString
    }
    b.result().toDF("source_file").withColumn("batch_id", lit("dead-beef"))
      .coalesce(1).write.parquet(pend)
    val r = CopyInto.copyInto(t, src)
    assert(r.rowsLoaded == 3L, "staged-but-uncommitted files must re-qualify")
    assert(t.read.count() == 3L)
    assert(!fs(tp).exists(new Path(pend)), "dead pending segment discarded")
  }

  test("loaded-file log survives OPTIMIZE (rewrite swaps the table dir, not the commits dir)") {
    val src = tmpDir("ci_opt_src")
    val tp = tmpDir("ci_opt_tbl")
    land(src, "b1", 1L to 6L)
    val t = MedallionTable(spark, tp)
    assert(CopyInto.copyInto(t, src).rowsLoaded == 6L)
    t.compact()
    val r = CopyInto.copyInto(t, src)
    assert(r == CopyInto.Result(0, 0L),
      "a compaction must not amnesia the copy log into re-loading")
    assert(t.read.count() == 6L)
  }

  test("crash recovery survives marker pruning: the durable witness outlives HistoryDepth commits") {
    import spark.implicits._
    val src = tmpDir("ci_prune_src")
    val tp = tmpDir("ci_prune_tbl")
    land(src, "b1", 1L to 4L)
    val t = MedallionTable(spark, tp)
    CopyInto.testFailpoint = {
      case "post-copy-commit" => throw new RuntimeException("injected crash")
      case _ => ()
    }
    try intercept[RuntimeException] { CopyInto.copyInto(t, src) }
    finally CopyInto.testFailpoint = _ => ()
    // other writers advance (and prune) the marker history before the
    // next COPY INTO ever runs — the copy-into op falls out of history
    (1 to MedallionTable.HistoryDepth + 1).foreach { i =>
      t.append(Seq((100L + i, "x")).toDF("id", "s"))
    }
    assert(!t.history().exists(_._2.startsWith("copy-into:")),
      "precondition: the marker must have pruned for this test to bite")
    val r = CopyInto.copyInto(t, src)
    assert(r == CopyInto.Result(0, 0L),
      "witness file must prevent the pruned batch from re-loading")
    assert(t.read.filter($"id" <= 4L).count() == 4L, "no duplicates")
  }

  test("concurrent COPY INTO runs serialize on the copy lock; the landing loads exactly once") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val src = tmpDir("ci_conc_src")
    val tp = tmpDir("ci_conc_tbl")
    land(src, "b1", 1L to 6L)
    val t = MedallionTable(spark, tp)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val results = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[CopyInto.Result] {
        def call(): CopyInto.Result = {
          start.await()
          CopyInto.copyInto(t, src)
        }
      })
    }
    start.countDown()
    val rs = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(rs.map(_.rowsLoaded).sorted == Seq(0L, 6L),
      s"exactly one run loads, the other no-ops: $rs")
    assert(t.read.count() == 6L)
  }

  test("CSV landing loads through the format/options passthrough") {
    import spark.implicits._
    val src = tmpDir("ci_csv_src")
    val tp = tmpDir("ci_csv_tbl")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.option("header", "true").csv(s"$src/b1")
    val t = MedallionTable(spark, tp)
    val r = CopyInto.copyInto(t, src, "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(r.rowsLoaded == 2L)
    assert(t.read.columns.toSet == Set("id", "s"))
    assert(CopyInto.copyInto(t, src, "csv",
      Map("header" -> "true", "inferSchema" -> "true")) == CopyInto.Result(0, 0L))
  }
}
