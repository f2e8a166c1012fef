package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

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
    * once turns every later cosine into a bare dot product. A native
    * expression ([[UnitNorm]]) rather than `transform(a, x -> x /
    * norm(a))`: the declarative form re-evaluates the norm subtree per
    * ELEMENT (it lives inside the lambda), turning every row's
    * normalization into O(d²) multiplies — measured as a whole-suite
    * tax on the ANN family at the sf1 decade. Results are
    * bit-identical (same square-sum order, same null/zero edges).
    */
  def normalized(a: Column): Column =
    DatasetBridge.column(UnitNorm(DatasetBridge.expression(a)))

  /** Id of the max-dot entry in an `array<struct<id, cvec>>` column. */
  def nearestDot(vec: Column, entries: Column): Column =
    DatasetBridge.column(NearestEntry(DatasetBridge.expression(vec),
      DatasetBridge.expression(entries), useL2 = false))

  /** Id of the min-L2² entry in an `array<struct<id, cvec>>` column. */
  def nearestL2(vec: Column, entries: Column): Column =
    DatasetBridge.column(NearestEntry(DatasetBridge.expression(vec),
      DatasetBridge.expression(entries), useL2 = true))

  /** Ids of the k max-dot entries (dot DESC, earliest-entry ties) in an
    * id-sorted `array<struct<id: long, cvec>>` column — multi-probe
    * cell routing as one codegen'd kernel call per row.
    */
  def topCellsDot(vec: Column, entries: Column, k: Int): Column =
    DatasetBridge.column(TopCellsDot(DatasetBridge.expression(vec),
      DatasetBridge.expression(entries), k))
}

/** Unit normalization of a float/double array as ONE kernel call per
  * row (see [[ExprKernels.unitNorm]] for the arithmetic-parity
  * contract with the `transform`+`norm` composition it replaces).
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_unit_norm"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    ExprKernels.unitNorm(a.asInstanceOf[ArrayData], isFloat,
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled,
      origin.context)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val qc = ctx.addReferenceObj("qryCtx", origin.context,
        "org.apache.spark.QueryContext")
      // ansi captured at codegen time — same capture discipline as
      // Spark's own arithmetic expressions (see JaccardSim)
      val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
      s"""
      ${ev.value} = graft.functions.ExprKernels.unitNorm($c, $isFloat,
        $ansi, $qc);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
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

/** Top-k max-dot entry ids from a broadcast array of (id: long, cvec)
  * structs — [[NearestEntry]] generalized to multi-probe IVF routing
  * (knn_graph: every corpus vector picks its nProbe candidate cells).
  * Same design rules: one static [[ExprKernels.topCellsDot]] call from
  * generated code so the WholeStageCodegen span stays intact, and the
  * strict-improvement insertion reproduces the `(dot DESC, id ASC)` tie
  * order of the window-rank form over an id-sorted entries array.
  */
case class TopCellsDot(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def prettyName: String = "graft_top_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val vecFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val entFloat = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields(1).dataType
    .asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any, e: Any): Any =
    ExprKernels.topCellsDot(v.asInstanceOf[ArrayData],
      e.asInstanceOf[ArrayData], k, vecFloat, entFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, e) => s"""
      ${ev.value} = graft.functions.ExprKernels.topCellsDot($v, $e, $k,
        $vecFloat, $entFloat);
      """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest entry in a broadcast array of (id, cvec) structs: argmax
  * dot product (IVF cell assignment) or argmin squared-L2 (PQ code
  * assignment), as ONE codegen'd kernel call per row.
  *
  * Replaces the `aggregate(entries, seedStruct, (acc, c) =>
  * when(score(c) better acc.score, struct(c.id, score)).otherwise(acc))`
  * fold: `ArrayAggregate` has no doGenCode, so that form evaluates
  * INTERPRETED — per row × per entry it allocates an acc struct,
  * dispatches a CaseWhen, and boxes every score. Measured at the
  * sf1→sf10 decade: corpus cell assignment (1.6 M × ~140 centroids ×
  * 64 dims) pegged one core for >7 min PER PARTITION, turning the
  * whole ANN family's index build pathological — this expression is
  * the same loop as a static kernel inside the WholeStageCodegen span.
  *
  * Tie/null parity with the fold it replaces: earliest entry wins ties
  * (callers pass an id-sorted array; replacement requires STRICT
  * improvement), entries whose score is null (length mismatch, null
  * element) are skipped, null if nothing qualifies.
  */
case class NearestEntry(left: Expression, right: Expression,
    useL2: Boolean) extends BinaryExpression {

  override def prettyName: String =
    if (useL2) "graft_nearest_l2" else "graft_nearest_dot"

  private lazy val entryType = right.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType]

  // result = the id field's own type (LongType IVF cells, IntegerType
  // PQ codes)
  override def dataType: DataType = entryType.fields(0).dataType
  override def nullable: Boolean = true

  private lazy val vecFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val entFloat = entryType.fields(1).dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  private lazy val idLong = entryType.fields(0).dataType == LongType

  override protected def nullSafeEval(v: Any, e: Any): Any =
    ExprKernels.nearestEntry(v.asInstanceOf[ArrayData],
      e.asInstanceOf[ArrayData], vecFloat, entFloat, useL2, idLong)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, e) => {
      val tmp = ctx.freshName("nearRes")
      val box = if (idLong) "java.lang.Long" else "java.lang.Integer"
      val unbox = if (idLong) "longValue" else "intValue"
      s"""
      Object $tmp = graft.functions.ExprKernels.nearestEntry($v, $e,
        $vecFloat, $entFloat, $useL2, $idLong);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (($box) $tmp).$unbox(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
