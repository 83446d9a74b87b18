package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Verify <sfDir> <outDir>")
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // AQE on cached-plan shuffles — same setting and rationale as
      // graft.Bench (round 19): cached frames otherwise run fixed-width
      // shuffles that defeat adaptive coalescing at every scale
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // INT64-micros timestamps (not legacy INT96) — same setting and
      // rationale as graft.GraftSession/Bench (round 20): INT96 chunk
      // stats are deprecated/unreliable (PARQUET-1065) so they can never
      // arm footer stats or row-group skipping; values are identical
      // (Spark timestamps are micros precision either way)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogNoise.silenceExpected()
    new java.io.File(outDir).mkdirs()
    // Per-query watchdog: one pathological query must not eat the whole
    // correctness round — cancel its job group after the timeout and move on.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val timeout = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toInt
    SparkEntry.queries.foreach { case (name, fn) =>
      val workerThread = new java.util.concurrent.atomic.AtomicReference[Thread]()
      val work = Future {
        // Job-group properties are thread-local: set them on the thread that
        // actually submits the Spark jobs (this pool thread), not main —
        // otherwise cancelJobGroup on timeout cancels nothing.
        workerThread.set(Thread.currentThread())
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try {
          // query evaluation (including every protocol table write) runs
          // under the session's INT64-micros timestamp output, exactly as
          // Bench executes it...
          val frame = fn(spark, sfDir)
          // ...but the RESULT DUMP keeps the legacy INT96 encoding:
          // DuckDB reads Spark's INT64 instant timestamps (annotated
          // isAdjustedToUTC=true) as TIMESTAMP WITH TIME ZONE, which the
          // oracle's naive-TIMESTAMP compare mis-flags on every ts column
          // (measured: 17 spurious FAILs). Queries run sequentially on
          // this one worker, so the scoped flip cannot leak into another
          // query's internal writes.
          val k = "spark.sql.parquet.outputTimestampType"
          spark.conf.set(k, "INT96")
          try frame.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally spark.conf.set(k, "TIMESTAMP_MICROS")
        } finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(work, timeout.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          // See Bench: one cancel misses queries hung in driver-side
          // planning or between AQE jobs — interrupt and keep cancelling.
          spark.sparkContext.cancelJobGroup(name)
          Option(workerThread.get()).foreach(_.interrupt())
          val canceller = new Thread(() => {
            while (!work.isCompleted) {
              Thread.sleep(5000)
              spark.sparkContext.cancelJobGroup(name)
            }
          }, s"verify-cancel-$name")
          canceller.setDaemon(true)
          canceller.start()
          System.err.println(s"[verify] $name timed out after ${timeout}s (cancelled)")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
