package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) over N
  * ranked retrieval arms — the standard way to combine sparse (BM25),
  * dense (ANN), and any other ranked signal without score calibration:
  *
  *   rrf(d) = Σ_arms round(1e6 / (k0 + rank_arm(d)))
  *
  * Each arm is a DataFrame of (id, rank) with rank 1-based; an id absent
  * from an arm contributes 0 (full-outer semantics). Contributions are
  * micro-rounded integers BEFORE the sum, so the fused score is
  * summation-order-independent and engine-comparable — the catalog's
  * hybrid queries hash-match a DuckDB oracle on exactly this arithmetic.
  *
  * Scale shape: arms are typically top-k lists (tens of rows after
  * TakeOrderedAndProject), so the fusion joins and the final top-k are
  * driver-trivial; with corpus-sized arms the full-outer join shuffles
  * on id like any aggregation — no all-pairs anywhere.
  */
object Rrf {

  /** Fuse `arms` (each (idCol, rankCol)) into (idCol, rrf_micro,
    * in_0..in_{n-1}) ordered by (rrf_micro DESC, idCol), truncated to
    * `k` rows. `k0` is the standard RRF damping constant (60).
    */
  def fuse(arms: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "need at least one arm")
    val tagged = arms.zipWithIndex.map { case (a, i) =>
      a.select(col(idCol), col(rankCol).cast("int").as(s"__rank_$i"))
    }
    val joined = tagged.reduce((l, r) => l.join(r, Seq(idCol), "full_outer"))
    val contribs = arms.indices.map { i =>
      coalesce(round(lit(1000000.0) / (col(s"__rank_$i") + k0)).cast("long"),
        lit(0L))
    }
    val flags = arms.indices.map(i => col(s"__rank_$i").isNotNull.as(s"in_$i"))
    joined.select(
        (col(idCol) +: contribs.reduce(_ + _).as("rrf_micro") +: flags): _*)
      .orderBy(col("rrf_micro").desc, col(idCol)).limit(k)
  }
}
