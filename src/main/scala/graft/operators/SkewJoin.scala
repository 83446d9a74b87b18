package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salt the skewed (fact) side
  * into `nSalts` sub-keys and replicate the build (dim) side once per salt,
  * so a hot key's rows spread across `nSalts` reducers instead of one.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins whose
  * skew is visible in shuffle statistics; explicit salting remains the tool
  * when the skew is known a priori, the join is keyed for downstream
  * partitioning, or AQE is unavailable (streaming-static joins).
  *
  * The salt is a deterministic hash of the fact row (not a RNG), so plans
  * stay reproducible run-to-run.
  */
object SkewJoin {

  /** Equi-join `fact ⋈ dim` on `keys` with the fact side salted.
    * Supported joinType: "inner" or "left" (semantics preserved exactly —
    * every fact row carries exactly one salt; every dim row exists for all
    * salts, so match cardinality per fact row is unchanged).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported joinType for salted join: $joinType")
    val salted = fact.withColumn("__graft_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(nSalts)).cast("int"))
    val replicated = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
