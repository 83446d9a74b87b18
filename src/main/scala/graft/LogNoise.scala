package graft

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
}
