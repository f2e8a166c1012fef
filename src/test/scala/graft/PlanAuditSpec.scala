package graft

/** Plan-shape proofs for the newest operators — the properties that
  * decide 100 TB viability, asserted on the physical plan so a
  * refactor can't silently regress them.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(name: String): String =
    q(name, sfDir).queryExecution.executedPlan.toString

  test("dedup_decontaminate: eval grams broadcast; no cartesian anywhere") {
    val p = plan("dedup_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q84 BFS: final plan is materialized levels only — no join replay") {
    // each hop's expansion (join + anti-join) ran ONCE during the loop;
    // the returned plan must be just the union of checkpointed levels,
    // proving no per-action re-execution of the whole BFS.
    val p = plan("q84_bfs_hops")
    assert(p.contains("Scan ExistingRDD"), p.take(500))
    assert(!p.contains("Join"), p.take(800))
  }

  test("q82 closure: frontier levels are checkpointed scans, no recursion in-plan") {
    // every closure level must appear as a materialized RDD scan — the
    // final plan must NOT re-derive level k from level k-1 (the
    // re-execution trap); one join over the unioned levels only.
    val p = plan("q82_bom_closure")
    assert(p.contains("Scan ExistingRDD"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("q85 rolling median: single window pass, one shuffle on user_id") {
    val p = plan("q85_rolling_median")
    // exactly one exchange below the window (plus the final global sort)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p.take(800))
  }
}
