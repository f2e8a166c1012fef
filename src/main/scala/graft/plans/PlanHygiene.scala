package graft.plans

/** Plan-hygiene checks (round 14).
  *
  * The one pathology these catch: Catalyst's CollapseProject counts
  * only the references OUTSIDE lambda bodies when deciding whether an
  * aliased expression is safe to inline, so a projection like
  *
  *   select(words(text).as("w"))
  *     .select(transform(w, (x, i) -> element_at(w, i)))
  *
  * gets `w`'s defining `split` inlined INTO the lambda and the
  * document re-tokenizes once per ELEMENT — O(tokens²) per row
  * (measured 24 s -> 1.4 s on the lm-bigram path at the sf1 decade).
  * The fix at each site is to build per-row arrays with slice /
  * concat / arrays_zip / zip_with so no lambda body references the
  * outer array; this detector keeps the property from regressing.
  */
object PlanHygiene {

  /** True when `split(` occurs INSIDE any `lambdafunction(...)` span
    * of the optimized-plan string — i.e. the tokenizer is re-evaluated
    * per array element. Spans are scanned per line with balanced
    * parens; a span the plan printer truncated (unbalanced by line
    * end) is skipped, so callers should render plans with a high
    * `spark.sql.debug.maxToStringFields`.
    *
    * Note the deliberate scope: `filter(split(text), lambda)` — the
    * tokenizer itself — puts `split` BEFORE the lambda and does not
    * match; `split(lambda x, ...)` of a lambda VARIABLE (e.g. the BPE
    * merge fold re-splitting one word's char-seq string) DOES match,
    * so callers exempt such by-design sites explicitly.
    */
  def lambdaReevaluatesSplit(plan: String): Boolean =
    plan.linesIterator.exists(lineHasSplitInLambda)

  private[graft] def lineHasSplitInLambda(l: String): Boolean = {
    var from = 0
    while ({ from = l.indexOf("lambdafunction(", from); from >= 0 }) {
      var i = from + "lambdafunction(".length
      var depth = 1
      val start = i
      while (depth > 0 && i < l.length) {
        l.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth == 0 && l.substring(start, i).contains("split("))
        return true
      from = from + 1
    }
    false
  }
}
