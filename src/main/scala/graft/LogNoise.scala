package graft

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Scoped log suppression shared by the driver-contract mains (Bench,
  * Verify): their ~2000-char output tail must end with the JSON/summary
  * line, so loggers whose WARNs are EXPECTED in normal operation are
  * pinned to ERROR — scoped to those loggers only, never the root.
  */
object LogNoise {
  def silenceExpected(): Unit = Seq(
    // ConnectedComponents releases its lazily-localCheckpointed per-round
    // state when done; Spark WARNs on every such unpersist.
    "org.apache.spark.rdd.MapPartitionsRDD",
    // One-shot "Truncated the string representation of a plan" notice —
    // purely about log/UI strings, not execution.
    "org.apache.spark.util.SparkStringUtils"
  ).foreach(n => org.apache.logging.log4j.core.config.Configurator.setLevel(
    n, org.apache.logging.log4j.Level.ERROR))

  /** Round-8 bench postmortem: a transient executor RPC stall printed a
    * multi-frame `RpcTimeout` stack ABOVE the JSON line, polluting the
    * driver's parsed ~2000-char tail (the exact failure class the r6/r7
    * verdicts flagged). Console appenders can't retro-scrub a stack that
    * already printed, so Bench routes ALL log4j output to a file instead:
    * stdout/stderr then carry only Bench's own prints — watchdog one-liners
    * and the final JSON line — and no Spark stack can ever reach the tail.
    */
  /** Minimal file appender (log4j2's self-referential builder generics do
    * not infer under Scala 2.13, so this writes events directly).
    */
  private final class FileSink(path: String) extends AbstractAppender(
      "graft-bench-file", null, null, true, null) {
    private val out = new java.io.PrintWriter(
      new java.io.BufferedWriter(new java.io.FileWriter(path, false)))
    override def append(event: LogEvent): Unit = out.synchronized {
      val msg = Option(event.getMessage).map(_.getFormattedMessage).getOrElse("")
      out.println(s"${event.getLevel} ${event.getLoggerName}: $msg")
      var t = event.getThrown
      while (t != null) {
        out.println(s"  caused by ${t.getClass.getName}: ${Option(t.getMessage).getOrElse("")}")
        t = t.getCause
      }
      out.flush()
    }
  }

  def redirectToFile(path: String): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app = new FileSink(path)
    app.start()
    cfg.addAppender(app)
    val root = cfg.getRootLogger
    import scala.jdk.CollectionConverters._
    root.getAppenders.keySet.asScala.toList.foreach(root.removeAppender)
    root.addAppender(app, null, null)
    ctx.updateLoggers()
  }

  /** Per-attempt RPC-stall detector. Round 8's `a2_static_agg14` recorded
    * 36.9 s in-bench (7.8× its trend) because a transient `RpcTimeout`
    * inside local-mode executor messaging stalled the attempt — the query
    * itself re-times 5.2 s isolated. A wall-clock number measured across
    * such a stall is evidence about the stall, not the query, so Bench
    * marks the attempt invalid for best-of-2 and retries. Detection is a
    * root-logger appender that flags any event whose message or thrown
    * chain mentions an RPC/heartbeat timeout.
    */
  final class RpcTripDetector extends AbstractAppender(
      "graft-rpc-trip", null, null, true, null) {
    @volatile private var trippedFlag = false
    override def append(event: LogEvent): Unit = {
      val msg = Option(event.getMessage).map(_.getFormattedMessage).getOrElse("")
      val thrown = {
        var t = event.getThrown
        val sb = new StringBuilder
        while (t != null) { sb.append(t.getClass.getName).append(' ')
          .append(Option(t.getMessage).getOrElse("")).append(' '); t = t.getCause }
        sb.toString
      }
      val hay = msg + " " + thrown
      if (hay.contains("RpcTimeout") || hay.contains("Futures timed out") ||
          hay.contains("Cannot receive any reply")) trippedFlag = true
    }
    def reset(): Unit = trippedFlag = false
    def tripped: Boolean = trippedFlag
  }

  /** Installs the detector on the root logger (alongside whatever appenders
    * are already configured) and returns it.
    */
  def installRpcTripDetector(): RpcTripDetector = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val det = new RpcTripDetector
    det.start()
    cfg.addAppender(det)
    cfg.getRootLogger.addAppender(det, null, null)
    ctx.updateLoggers()
    det
  }
}
