package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded query-side model for [[HybridLexScores]]: the ≤5 hybrid
  * queries' (term → idf_q) weight maps, combined into ONE hash map
  * term → per-query weight vector (−1 = term absent from that query;
  * idf_q is always ≥ 0) so scoring a document costs one hash lookup
  * per document term — not |queries| lookups, and not the
  * O(|map|·|terms|) linear scans an interpreted higher-order
  * `filter`/`aggregate` over a map literal pays (ArrayAggregate has
  * no codegen; the r18 first cut measured that shape at 90 s solo
  * sf10 vs the 47 s posting join it replaced — see SURVEY §20).
  *
  * Rides into generated code as a reference object (the CmsEstimate
  * pattern), i.e. the broadcast-model serving shape: every executor
  * scores locally against the same tiny immutable model.
  *
  * `terms`/`termQ`/`termW` are parallel arrays (term, query index,
  * weight); `qids` maps query index → qid. Bounded by construction:
  * callers cap terms per query (knn_hybrid: 1024 top-idf).
  */
final class HybridLexModel(val qids: Array[Long], terms: Array[String],
    termQ: Array[Int], termW: Array[Long]) extends Serializable {

  require(terms.length == termQ.length && terms.length == termW.length,
    "parallel model arrays must align")

  @transient private lazy val lookup
      : java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](
      terms.length * 2 + 1)
    var i = 0
    while (i < terms.length) {
      val k = UTF8String.fromString(terms(i))
      var v = m.get(k)
      if (v == null) { v = Array.fill(qids.length)(-1L); m.put(k, v) }
      v(termQ(i)) = termW(i)
      i += 1
    }
    m
  }

  /** (qid, cnt, lexs) per query for one document's distinct terms:
    * cnt = shared-term count (presence survives idf 0 — the inner-join
    * semantics), lexs = Σ idf_q over shared terms (exact Long sum).
    */
  def score(ts: ArrayData): ArrayData = {
    val q = qids.length
    val cnt = new Array[Long](q)
    val sum = new Array[Long](q)
    val n = ts.numElements()
    var i = 0
    while (i < n) {
      val t = ts.getUTF8String(i)
      if (t != null) {
        val v = lookup.get(t)
        if (v != null) {
          var j = 0
          while (j < q) {
            if (v(j) >= 0) { cnt(j) += 1; sum(j) += v(j) }
            j += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Any](q)
    var j = 0
    while (j < q) {
      out(j) = InternalRow(qids(j), cnt(j), sum(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-document hybrid-lexical scorer: array<string> of the
  * doc's distinct terms → array of (qid, cnt, lexs) structs, one per
  * query in the bounded [[HybridLexModel]]. Used by knn_hybrid's
  * JOIN-FREE lexical ranking (SURVEY §20, VERDICT r17 #4).
  */
case class HybridLexScores(child: Expression, model: HybridLexModel)
    extends UnaryExpression {

  override def prettyName: String = "graft_hybrid_lex"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("lexs", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    model.score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("hybridLexModel", model,
        classOf[HybridLexModel].getName)
      s"${ev.value} = $m.score($c);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : HybridLexScores = copy(child = newChild)
}
