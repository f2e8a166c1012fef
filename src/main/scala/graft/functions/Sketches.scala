package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probes into pre-built sketch artifacts as native codegen'd
  * expressions. The engine's one-row sketch AGGREGATES are already
  * engine-native (BloomFilterAggregate in q42 / the dedup Bloom gates,
  * `df.stat.countMinSketch` for CMS builds); this file makes the PROBE
  * side native too, so a sketch prefilter sits inside the scan's
  * WholeStageCodegen span instead of forcing a deserialize-to-Row
  * boundary around a Scala UDF (VERDICT r15 #5 — these were the last
  * two UDFs in the hot path).
  */
object Sketches {

  /** `estimateCount(key)` against a driver-built [[CountMinSketch]].
    * The sketch rides the stage's task binary (itself a broadcast), so
    * distribution cost matches the explicit `sparkContext.broadcast`
    * the UDF form used — but the probe compiles into the surrounding
    * codegen span: no row-boundary, no per-row boxing of the key
    * (string keys probe the UTF8String's bytes directly — byte-wise
    * identical to the String path, which round-trips through the same
    * UTF-8 bytes).
    */
  def cmsEstimate(sketch: CountMinSketch, key: Column): Column =
    DatasetBridge.column(CmsEstimate(DatasetBridge.expression(key), sketch))
}

/** `estimateCount` probe of one CMS per row — LongType, null-safe.
  * Supports the two key types the engine builds sketches over
  * (string grams, long ids); anything else fails analysis loudly
  * rather than hashing inconsistently with the build side.
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType

  private lazy val isString = child.dataType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_estimate supports string/bigint keys, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    if (isString) sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes)
    else sketch.estimateCount(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cms = ctx.addReferenceObj("cms", sketch,
        classOf[CountMinSketch].getName)
      if (isString) s"${ev.value} = $cms.estimateCount($c.getBytes());"
      else s"${ev.value} = $cms.estimateCount(java.lang.Long.valueOf($c));"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimate = copy(child = newChild)
}
