package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry for ENTRY-SCRATCH caches — persisted
  * relations a single query needs across DAG branches (a self-join's
  * two sides, a multi-consumer intermediate) but that have no life
  * after the query returns.
  *
  * Why this exists: the long-lived per-session INDEX caches
  * (shingle/banded-sig/IVF/PQ/LM — the deployment "build once, serve
  * many" contract, seeded untimed by the warmCaches) are bounded and
  * deliberate. Entry scratch is neither: Spark's CacheManager keeps a
  * persisted plan resident until someone unpersists it, so every
  * entry that persisted a scratch relation left one copy pinned for
  * the REST of the suite — 221 entries deep, that accumulation is
  * what pushed the r17 sf10 full-suite run over a 48 g heap at entry
  * 218 (target/bench_sf10_r17.log). On a real cluster the analogue is
  * a long-lived session (Thrift server, notebook) accreting dead
  * cache until executors OOM: queries must release what they persist.
  *
  * Contract: an operator calls [[reg]] instead of bare `.persist()`
  * for anything that should die with the query; the harness (Bench
  * per entry AFTER its reps — so min-of-k still measures scratch-warm
  * serving, same as before — and Verify per query) calls [[drain]].
  * Unpersist is idempotent, so re-registration across reps (the
  * CacheManager dedups the plan to one resident copy) is harmless.
  * A host that never drains keeps its cached plans resident exactly
  * as bare `.persist()` would — registration alone changes nothing
  * about cache lifetime; it only makes release POSSIBLE.
  *
  * Scope contract (ADVICE r17): registration is per SESSION, not per
  * query — [[drain]] releases EVERYTHING registered on the session
  * since the last drain. A host that runs queries concurrently on one
  * session (Thrift server, shared notebook) must therefore drain only
  * at quiesce points (no query in flight), or give each query its own
  * `spark.newSession()` (scratch and drain then scope to that child
  * session naturally, since registration keys on the session object).
  * The in-repo harnesses run entries sequentially, which is the
  * single-query-at-a-time shape this contract describes.
  *
  * Leak note (ADVICE r17): entries hold strong Dataset refs until
  * drained — a WeakReference value would let the wrapper be GC'd
  * before drain and leak the CacheManager entry it was supposed to
  * release. Instead, [[reg]] and [[drain]] purge entries whose
  * session's SparkContext has stopped (their cached blocks died with
  * the executors; only the plan graphs linger), so an abandoned
  * STOPPED session can no longer pin its session + plans for the
  * JVM's life. An abandoned still-RUNNING session is indistinguishable
  * from an in-flight query and remains the host's drain
  * responsibility, per the scope contract above.
  */
object Scratch {
  private val reg =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ListBuffer[Dataset[_]]]()

  /** Drop entries whose SparkContext has stopped: their cached blocks
    * are already gone (block manager died with the context), so the
    * registry must not keep the dead session + its plan graphs
    * strongly reachable. Caller must hold the `reg` lock.
    */
  private def purgeStopped(): Unit = {
    val it = reg.keySet().iterator()
    while (it.hasNext) {
      val s = it.next()
      if (s != null && s.sparkContext.isStopped) it.remove()
    }
  }

  /** Persist `ds` and register it for the next [[drain]]. */
  def reg[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    reg.synchronized {
      purgeStopped()
      var buf = reg.get(s)
      if (buf == null) {
        buf = scala.collection.mutable.ListBuffer.empty[Dataset[_]]
        reg.put(s, buf)
      }
      buf += ds
    }
    ds.persist()
  }

  /** Unpersist (non-blocking) everything registered on `s` since the
    * last drain. Cached INDEX relations are untouched — only what went
    * through [[reg]].
    */
  def drain(s: SparkSession): Unit = {
    val buf = reg.synchronized { purgeStopped(); reg.remove(s) }
    if (buf != null) buf.foreach { ds =>
      try ds.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
