package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `QuantileBucket(x, cuts)` — how many of the sorted distinct cut-points
  * are strictly below x, via `Arrays.binarySearch`: O(log k) per row and
  * firmly inside whole-stage codegen. The k-term `when`-chain it replaces
  * was formally codegen'd but a 255-cut chain overflows the generated
  * method and falls back to interpreted evaluation — measured ~40 µs/row
  * on the Z-order maintenance path (24 s to bucket 600 k rows × 2
  * columns; this expression does it in milliseconds).
  *
  * NULL input buckets to 0, matching the chain it replaces
  * (`when(null > cp, 1).otherwise(0)` summed to 0) — Z-order sends null
  * cluster values to the lowest bucket rather than a null z-value.
  */
case class QuantileBucket(child: Expression, cuts: Seq[Double])
    extends UnaryExpression {
  private lazy val sortedCuts: Array[Double] = cuts.distinct.sorted.toArray

  override def prettyName: String = "graft_quantile_bucket"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val x = child.eval(input)
    if (x == null) 0L
    else {
      val i = java.util.Arrays.binarySearch(sortedCuts, x.asInstanceOf[Double])
      if (i >= 0) i.toLong else (-i - 1).toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", sortedCuts, "double[]")
    val childGen = child.genCode(ctx)
    val idx = ctx.freshName("idx")
    val code =
      code"""
        |${childGen.code}
        |long ${ev.value} = 0L;
        |if (!${childGen.isNull}) {
        |  int $idx = java.util.Arrays.binarySearch($cutsRef, ${childGen.value});
        |  ${ev.value} = $idx >= 0 ? (long) $idx : (long) (-$idx - 1);
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}
