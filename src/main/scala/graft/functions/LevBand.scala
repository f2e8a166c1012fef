package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-banded Levenshtein distance: exact when <= k, capped at
  * k+1 beyond — `levenshtein(a, b) <= k` and `LevenshteinBand(a, b, k)
  * <= k` select identical rows, but the band evaluates O(k·n) cells
  * with early exit instead of the full O(n·m) matrix. The inner loop
  * of blocked fuzzy matching (q71), where virtually all candidate
  * pairs are far apart and the full matrix is wasted work. Kernel in
  * [[ExprKernels.levBand]]; real `doGenCode` keeps it inside
  * whole-stage codegen.
  */
case class LevenshteinBand(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"band threshold must be >= 0, got $k")

  override def prettyName: String = "graft_lev_band"
  override def dataType: DataType = IntegerType

  // AbstractDataType (the ExpectsInputTypes currency) is private[sql]
  // in Spark 4, so the input contract is enforced directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ExprKernels.levBand(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ExprKernels.levBand($l, $r, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
