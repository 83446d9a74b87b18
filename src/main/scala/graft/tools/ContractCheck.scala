package graft.tools
object ContractCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    val orphanOracles = o -- q
    val rowsOnly = q -- o
    println(s"orphan oracles (BAD): ${orphanOracles.toSeq.sorted.mkString(",")}")
    println(s"rows-only (expected): ${rowsOnly.toSeq.sorted.mkString(",")}")
    require(orphanOracles.isEmpty)
  }
}
