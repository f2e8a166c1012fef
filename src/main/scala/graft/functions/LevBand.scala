package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
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

/** FastSS symmetric-deletion blocking keys for threshold-k fuzzy
  * matching: hashes of every ≤ k-deletion variant of the string's
  * last-`w`-chars window. Pairs with edit distance ≤ k are GUARANTEED
  * to share a key (recall-1 proof in [[ExprKernels.delVariants]]), so
  * the equi-join on the exploded keys is a recall-1 candidate
  * generator whose block sizes track distinct-value multiplicity
  * instead of a fixed attribute block's quadratic growth (the q71
  * scale fix — measured super-linear at the sf1 decade with attribute
  * blocking). The window keeps the per-row variant count CONSTANT
  * (C(w,2)+w+1) instead of O(len²).
  */
case class DeletionVariants(child: Expression, k: Int, w: Int = 12)
    extends UnaryExpression {

  require(k >= 1 && k <= 2, s"supported k in [1,2], got $k")
  require(w >= 4 && w <= 64, s"supported window in [4,64], got $w")

  override def prettyName: String = "graft_del_variants"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.delVariants(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprKernels.delVariants($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
