package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** CHECK-constraint gate riding ON an output column (Delta's
  * `CheckInvariant` shape, `delta/constraints/CheckInvariant`-style):
  * evaluates `check` against the row and throws when it is FALSE (SQL
  * CHECK semantics — NULL passes; callers wrap the raw constraint in
  * `coalesce(expr, true)`), otherwise returns `child` unchanged.
  *
  * Why not a filter: `Filter(assert_true(...))` is a deterministic
  * predicate, and Catalyst's PushDownPredicates may move it BELOW the
  * caller's joins/aggregates — evaluating the constraint on intermediate
  * rows that never reach the written batch, so a valid batch can be
  * spuriously rejected (e.g. a pre-join row that the join filters out).
  * An expression fused into a projected output column is pinned to the
  * final per-row output: projections are never pushed below joins, and
  * column pruning cannot remove it because the column IS part of the
  * written schema.
  */
case class CheckInvariant(child: Expression, check: Expression, msg: String)
    extends Expression {

  override def children: Seq[Expression] = Seq(child, check)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_check_invariant"

  override def eval(input: InternalRow): Any = {
    if (check.eval(input) == false) throw new RuntimeException(msg)
    child.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val checkGen = check.genCode(ctx)
    val childGen = child.genCode(ctx)
    val msgRef = ctx.addReferenceObj("graftCheckMsg", msg, "java.lang.String")
    val code =
      code"""
        ${checkGen.code}
        if (!${checkGen.isNull} && !${checkGen.value}) {
          throw new RuntimeException($msgRef);
        }
        ${childGen.code}
      """
    ev.copy(code = code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CheckInvariant =
    copy(child = newChildren(0), check = newChildren(1))
}
