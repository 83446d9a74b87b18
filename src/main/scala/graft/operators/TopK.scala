package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group via a typed [[Aggregator]] (SURVEY.md §7.3's
  * "TypedImperativeAggregate for top-k" showcase): each partial aggregate
  * keeps at most k rows, so the shuffle carries k·|groups| rows instead of
  * the whole table, and no partition-wide sort happens — the window
  * `row_number` formulation sorts every partition fully before discarding
  * all but k rows.
  *
  * Ordering is (value DESC, id1 ASC, id2 ASC) — a total order, so results
  * are deterministic and oracle-comparable.
  */
object TopK {

  type Row3 = (Double, Long, Long) // (value, id1, id2)

  private def better(a: Row3, b: Row3): Boolean =
    a._1 > b._1 || (a._1 == b._1 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  /** Buffer = up-to-k rows kept sorted best-first (k is small; insertion
    * into a tiny vector beats heap constant factors and stays Encoder-friendly).
    */
  class TopKAggregator(k: Int) extends Aggregator[Row3, Seq[Row3], Seq[Row3]] {
    override def zero: Seq[Row3] = Vector.empty
    override def reduce(buf: Seq[Row3], row: Row3): Seq[Row3] = insert(buf, row)
    override def merge(a: Seq[Row3], b: Seq[Row3]): Seq[Row3] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Row3]): Seq[Row3] = r
    override def bufferEncoder: Encoder[Seq[Row3]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Row3]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    private def insert(buf: Seq[Row3], row: Row3): Seq[Row3] = {
      if (buf.size >= k && better(buf.last, row)) buf
      else {
        val i = buf.indexWhere(b => better(row, b))
        val withRow = if (i < 0) buf :+ row else (buf.take(i) :+ row) ++ buf.drop(i)
        withRow.take(k)
      }
    }
  }

  /** Top-k rows per key group of `df`, ranked by `valueCol` DESC with
    * (id1, id2) tie-breaks. Output: key cols + id1 + id2 + value + rank.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], valueCol: String,
      id1: String, id2: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double"), col(id1).cast("long"),
        col(id2).cast("long")).as("top"))
      .select((keyCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "row"))): _*)
      .select((keyCols.map(col) :+
        col("row._2").as(id1) :+ col("row._3").as(id2) :+
        col("row._1").as(valueCol) :+
        (col("pos") + 1).cast("int").as("rank")): _*)
  }
}
