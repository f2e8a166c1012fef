package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 62-bit Morton (z-order) code: the bits of each operand's lower 31
  * bits interleaved — points close in BOTH dimensions get close
  * z-values, which is what lets a range-partitioned write produce
  * rectangle-shaped files (see [[graft.sources.ZOrder]]). Kernel in
  * [[ExprKernels.zvalue]]; codegen'd. SQL: `graft_zvalue(a, b)`.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_zvalue"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ExprKernels.zvalue(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ExprKernels.zvalue($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
