package graft

import org.apache.spark.sql.functions._

/** The native expressions implement real `doGenCode` (not
  * CodegenFallback). Codegen COMPILE errors normally fall back to
  * interpreted execution silently (`spark.sql.codegen.fallback=true`),
  * which would hide a broken generated-code path and quietly break
  * every surrounding WholeStageCodegen span — so this suite runs the
  * expression-heavy operators with fallback DISABLED, making any
  * Janino compile failure a test failure. Value correctness vs the
  * interpreted path is covered by the per-operator specs.
  */
class CodegenSpec extends SparkSuite {

  private def withNoFallback[T](f: => T): T = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  test("minhash/simhash/ngrams/jaccard/dot compile under codegen") {
    withNoFallback {
      // drive every native expression through a real plan
      assert(q("dedup_minhash", Fixtures.dir).collect().nonEmpty)
      assert(q("dedup_simhash", Fixtures.dir).collect().nonEmpty)
      assert(q("dedup_ngram_jaccard", Fixtures.dir).collect().nonEmpty)
      assert(q("dedup_embedding", Fixtures.dir).collect().nonEmpty)
      assert(q("knn_brute", Fixtures.dir).collect().nonEmpty)
      assert(q("text_fingerprint", Fixtures.dir).collect().nonEmpty)
    }
  }

  test("generated plan contains no CodegenFallback for the native exprs") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // AQE wraps the plan until first execution — disable it so the
    // static executedPlan exposes the WholeStageCodegen spans directly
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val exec = try org.apache.spark.sql.classic.ClassicConversions
      .castToImpl(q("dedup_simhash", Fixtures.dir))
      .queryExecution.executedPlan
    finally spark.conf.set(aqeKey, prev)
    // every graft expression must sit INSIDE a WholeStageCodegen span;
    // a fallback expression would force its projection outside
    val insideCodegen = exec.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("graft_simhash"))
    assert(insideCodegen,
      s"graft_simhash not inside a WholeStageCodegen span:\n$exec")
  }
}
