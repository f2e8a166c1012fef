package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Divide, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Single-pass Jaccard similarity of two array columns:
  * |A ∩ B| / |A ∪ B| over distinct elements. Equivalent to
  * `size(array_intersect(a,b)) / size(array_union(a,b))` but builds two
  * hash sets and two counters instead of materializing two intermediate
  * ARRAYS that are immediately reduced to their sizes — the inner loop
  * of every LSH verification join (DedupOps), where the intermediate
  * arrays are pure allocation overhead.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_jaccard_sim"
  override def dataType: DataType = DoubleType

  // Replaces a Divide (always nullable): empty/empty yields NULL in
  // non-ANSI mode even when both children are non-nullable (ADVICE r2).
  override def nullable: Boolean = true

  private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData].toObjectArray(elemType)
    val ra = r.asInstanceOf[ArrayData].toObjectArray(elemType)
    val lSet = new java.util.HashSet[Any](la.length * 2)
    var i = 0
    while (i < la.length) { lSet.add(la(i)); i += 1 }
    val seen = new java.util.HashSet[Any](ra.length * 2)
    var inter = 0
    var rDistinct = 0
    i = 0
    while (i < ra.length) {
      if (seen.add(ra(i))) {
        rDistinct += 1
        if (lSet.contains(ra(i))) inter += 1
      }
      i += 1
    }
    val union = lSet.size + rDistinct - inter
    if (union == 0) {
      // Two empty arrays: match Divide(0, 0) exactly so the optimizer
      // rewrite is value-identical — NULL in default mode, the standard
      // divide-by-zero error under ANSI (ADVICE r1).
      if (org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
        throw org.apache.spark.sql.graft.DatasetBridge
          .divideByZeroError(origin.context)
      else null
    } else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (preference-path Rule[LogicalPlan] from SURVEY §4):
  * rewrites the declarative Jaccard pattern
  * `size(array_intersect(a,b)) / size(array_union(a,b))` (any cast
  * placement) into [[JaccardSim]]. Values are bit-identical: both
  * compute int-exact counts then one double division. Register via
  * `spark.experimental.extraOptimizations` or [[graft.plans.GraftExtensions]].
  */
object RewriteJaccard extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(l, r, _) =>
        (strip(l), strip(r)) match {
          case (Size(ArrayIntersect(a, b), _), Size(ArrayUnion(a2, b2), _))
              if a.semanticEquals(a2) && b.semanticEquals(b2) =>
            JaccardSim(a, b)
          case _ => d
        }
    }
}
