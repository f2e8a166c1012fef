package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.graft.DatasetBridge

/** Central registry for the engine's LONG-LIVED per-(session, corpus)
  * index caches — IVF centroids/assignments/radii, PQ codebooks+codes,
  * MinHash shingles/banded signatures, gram Blooms and postings
  * stores, the LM bigram model, classifier weights, memoized counts
  * and on-disk index paths. These are the "build once, serve many"
  * artifacts [[Scratch]] deliberately exempts: they SHOULD outlive a
  * query. What they must not do is accrete without bound in a
  * long-lived session (Thrift server, notebook) that touches corpus
  * after corpus — the same executor-OOM argument that motivated the
  * per-entry scratch drain, one level up (VERDICT r17 #5; the r17 sf30
  * suite measured ~100 GB RSS for one corpus's warmed indexes + state
  * in one JVM).
  *
  * What this gives every cache that routes through [[getOrBuild]]:
  *
  *  - ONE bookkeeping shape (weak session key → (corpus, artifact) →
  *    entry) instead of a per-module WeakHashMap+TrieMap copy;
  *  - size accounting: each touch re-probes the materialized
  *    CacheManager bytes of every Dataset in the entry's value
  *    ([[DatasetBridge.cachedBytes]] — memory + disk), exposed via
  *    [[sizeBytes]]/[[stats]] so a host can watch the footprint;
  *  - LRU eviction by CORPUS GROUP when `graft.index.cacheBudgetBytes`
  *    is set (> 0): after a touch pushes the tracked total over
  *    budget, whole least-recently-used corpora — never the one just
  *    touched — are released (Datasets unpersisted, entries dropped)
  *    until the total fits or only the current corpus remains. A
  *    corpus is evicted WHOLE because its artifacts are mutually
  *    derived (assignments reference centroids, stores reference
  *    signatures): dropping half would leave rebuilds that silently
  *    mix generations.
  *
  * Eviction is correctness-neutral by construction: every artifact
  * here is a deterministic function of (corpus dir, session confs), so
  * a re-touch after eviction rebuilds bit-identical state — the cost
  * is rebuild time, the exact trade an LRU makes. The budget is
  * unset/0 by default (unbounded, today's behavior): serving
  * deployments size it to executor storage memory; the harness leaves
  * it off because Bench runs one corpus per JVM and
  * MEMORY_AND_DISK persists already spill under heap pressure.
  *
  * Values may be Datasets, tuples of Datasets, or plain driver
  * artifacts (Array[Long] weights, Long counts, String paths) —
  * release walks Products and unpersists every Dataset it finds;
  * non-Dataset values are simply dropped (cheap deterministic
  * rebuilds).
  */
object IndexCache {

  /** Budget conf key: max tracked bytes of materialized index cache
    * per session; 0 / unset = unbounded.
    */
  val BudgetConf = "graft.index.cacheBudgetBytes"

  final case class Stat(corpus: String, artifact: String, bytes: Long,
      tick: Long)

  private final class Ent(val value: Any) {
    @volatile var tick: Long = 0L
    @volatile var bytes: Long = 0L
  }

  private val clock = new AtomicLong()
  private val reg =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), Ent]]()

  /** Drop every registry entry whose session's SparkContext has
    * STOPPED. The WeakHashMap's weak keys cannot do this alone: Ent
    * values hold Datasets, and a Dataset strongly references its
    * SparkSession — a value→key strong path that pins the "weak" key
    * (and the session's plan graphs) for the JVM's life once the
    * session is abandoned. Same failure class, same remedy as
    * [[Scratch]]'s purge: a stopped context's cached blocks died with
    * its executors, so removing the entries (no unpersist needed)
    * releases everything that lingered.
    */
  private def purgeStoppedLocked(): Unit = {
    val it = reg.entrySet().iterator()
    while (it.hasNext) {
      val s = it.next().getKey
      if (s != null && s.sparkContext.isStopped) it.remove()
    }
  }

  private def perSession(s: SparkSession) = reg.synchronized {
    purgeStoppedLocked()
    reg.computeIfAbsent(s,
      _ => scala.collection.concurrent.TrieMap.empty[(String, String), Ent])
  }

  /** Memoize `build` under (session, corpus, artifact); touch LRU
    * state; enforce the session budget. Reentrant: `build` may itself
    * call getOrBuild for other artifacts (assignments build centroids).
    */
  def getOrBuild[T](s: SparkSession, corpus: String, artifact: String)(
      build: => T): T = {
    val m = perSession(s)
    val ent = m.getOrElseUpdate((corpus, artifact), new Ent(build))
    ent.tick = clock.incrementAndGet()
    ent.bytes = measure(ent.value)
    maybeEvict(s, m, keep = corpus)
    ent.value.asInstanceOf[T]
  }

  /** Materialized cache bytes across every Dataset in `v` (0 for
    * driver artifacts and not-yet-built caches; re-probed per touch).
    */
  private def measure(v: Any): Long = v match {
    case d: Dataset[_] => DatasetBridge.cachedBytes(d).getOrElse(0L)
    case p: Product => p.productIterator.map(measure).sum
    case _ => 0L
  }

  private def release(v: Any): Unit = v match {
    case d: Dataset[_] =>
      try d.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    case p: Product => p.productIterator.foreach(release)
    case _ => ()
  }

  private def budget(s: SparkSession): Long =
    s.conf.getOption(BudgetConf).map(_.toLong).getOrElse(0L)

  /** Evict LRU corpus groups (never `keep`) while over budget. Loud:
    * each eviction logs corpus + released bytes to stderr, so a
    * serving deployment sees its index churn instead of silently
    * re-paying builds.
    */
  private def maybeEvict(s: SparkSession,
      m: scala.collection.concurrent.TrieMap[(String, String), Ent],
      keep: String): Unit = {
    val b = budget(s)
    if (b <= 0) return
    m.synchronized {
      var total = m.values.map(_.bytes).sum
      while (total > b) {
        val victims = m.toSeq.filter(_._1._1 != keep)
        if (victims.isEmpty) return
        val lru = victims.groupBy(_._1._1).minBy {
          case (_, es) => es.map(_._2.tick).max
        }
        val freed = lru._2.map(_._2.bytes).sum
        System.err.println(
          s"[graft.IndexCache] evicting index cache for corpus " +
            s"'${lru._1}' (${lru._2.size} artifacts, $freed tracked " +
            s"bytes) — session over $BudgetConf=$b")
        lru._2.foreach { case (k, e) => release(e.value); m.remove(k) }
        total -= freed
        // freed == 0 (an all-driver-artifact corpus) is fine to loop
        // past: the victim is already out of the map, so the next
        // iteration sees strictly fewer candidates and terminates via
        // victims.isEmpty — an early return here would silently defer
        // budget enforcement past remaining over-budget corpora.
      }
    }
  }

  /** Tracked materialized bytes for the session (re-probes first). */
  def sizeBytes(s: SparkSession): Long = {
    val m = perSession(s)
    m.values.foreach(e => e.bytes = measure(e.value))
    m.values.map(_.bytes).sum
  }

  /** One row per cached artifact, freshly re-probed. */
  def stats(s: SparkSession): Seq[Stat] = {
    val m = perSession(s)
    m.toSeq.map { case ((c, a), e) =>
      e.bytes = measure(e.value)
      Stat(c, a, e.bytes, e.tick)
    }.sortBy(st => (st.corpus, st.artifact))
  }

  /** RAW registry membership probe (test hook — IndexCachePurgeSpec):
    * reads the map without touching it, so it observes whether a
    * stopped session's entries are still registered WITHOUT triggering
    * the purge the spec is asserting.
    */
  private[graft] def registryHas(s: SparkSession): Boolean =
    reg.synchronized(reg.containsKey(s))

  /** Release + drop every artifact of `corpus` on this session (ops /
    * test hook — e.g. after regenerating a corpus dir in place).
    */
  def evictCorpus(s: SparkSession, corpus: String): Unit = {
    val m = perSession(s)
    m.keys.filter(_._1 == corpus).foreach { k =>
      m.remove(k).foreach(e => release(e.value))
    }
  }
}
