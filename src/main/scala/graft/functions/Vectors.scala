package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense-vector math over `array<float|double>` columns. The dot
  * product — the inner loop of every similarity-search operator — is a
  * native expression iterating the columnar array data with no per-
  * element lambda dispatch or boxing; accumulation order is the same
  * left-to-right sequence as the declarative `zip_with`+`aggregate`
  * form, so results are bit-identical and partition-independent.
  */
object Vectors {
  def dot(a: Column, b: Column): Column =
    DatasetBridge.column(DotProd(
      DatasetBridge.expression(a), DatasetBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy (as array<double>); pre-normalizing a corpus
    * once turns every later cosine into a bare dot product.
    */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }
}

/** Sequential-sum dot product of two float/double arrays. NULL if
  * either array (or any element) is null, or if the lengths differ —
  * the same propagation as the zip_with+aggregate composition it
  * replaces (zip_with pads the shorter side with NULL elements, which
  * poison the sum). Codegen'd: one static [[ExprKernels.dot]] call, so
  * the surrounding WholeStageCodegen span stays intact.
  */
case class DotProd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Can produce NULL (null element, length mismatch) even for
  // non-nullable array children whose elementType containsNull
  // (ADVICE r2) — never inherit child nullability.
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val lFloat = isFloat(left)
  private lazy val rFloat = isFloat(right)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ExprKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("dotRes")
      s"""
      java.lang.Double $tmp = graft.functions.ExprKernels.dot($l, $r, $lFloat, $rFloat);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
