package graft

/** Location scheme for the oracle-base dumps (the candidate-generation
  * intermediates DuckDB re-derives downstream logic from). Dumps are
  * scoped BY CORPUS DIR **and BY applicationId**: the `oracleSql`
  * strings are built statically (no dir or session in scope), so they
  * bake in literal placeholders and [[Verify]] substitutes the actual
  * corpus slug and its own applicationId when it writes
  * `oracle_sql.json`. Corpus scoping stops an entry invocation against
  * another dir from clobbering the gate's dumps; applicationId scoping
  * stops a CONCURRENT JVM on the SAME corpus (a test suite or bench
  * interleaved with Verify) from overwriting the store mid-read —
  * centroid training uses avg() (order-dependent float sum), so a
  * concurrent re-dump between Verify and the DuckDB compare could
  * otherwise flip hash comparisons.
  */
object OracleDumps {
  val Base = "/root/repo/target/graft_scratch/oracle_base"
  /** Literal tokens inside static SQL strings. */
  val Placeholder = "__GRAFT_SF_SLUG__"
  val AppIdPlaceholder = "__GRAFT_APP_ID__"
  def slug(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")
  /** Collision-free scratch-store slug (ADVICE r15): the sanitized dir
    * plus a hex hash of the RAW string, so two distinct corpus dirs
    * that sanitize identically (`target/sf1` vs `target_sf1`) can
    * never share a standing-index store. Used by the per-corpus
    * parquet stores (minhash / histgram / ivf); stale copies are
    * pruned by [[housekeep]] via the trailing `local_<millis>` appId
    * stamp those store names keep LAST in the path.
    */
  def scratchSlug(dir: String): String =
    slug(dir) + "_h" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
  /** Runtime dump root for entries writing against `dir` from session
    * `s` — unique per (corpus, JVM).
    */
  def root(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    housekeep(s)
    s"$Base/${slug(dir)}__${s.sparkContext.applicationId}"
  }

  /** Millis stamp embedded in a local-mode applicationId (or in a dir
    * name derived from one — slugging turns `local-123` into
    * `local_123`). None for non-local masters.
    */
  private[graft] def appTs(name: String): Option[Long] =
    raw"local[-_](\d{10,})".r.findAllMatchIn(name).toSeq.lastOption
      .map(_.group(1).toLong)

  /** App-ID scoping means every JVM (each suite, bench, Verify run)
    * writes a fresh copy of the dumps and stores — without cleanup
    * they accumulate unboundedly across rounds (ADVICE r7). Once per
    * JVM, delete any sibling scoped dir stamped >3 h OLDER than this
    * app's own local-<millis> stamp. Age is measured app-to-app (no
    * wall clock), the margin keeps every concurrent JVM and any
    * just-exited Verify run alive — the driver's DuckDB compare reads
    * the dumps minutes AFTER the Verify JVM exits, which is also why
    * a session must never delete its OWN dumps on shutdown.
    */
  private val housekept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val StaleMs = 3L * 3600 * 1000
  def housekeep(s: org.apache.spark.sql.SparkSession): Unit =
    if (housekept.compareAndSet(false, true))
      appTs(s.sparkContext.applicationId).foreach(ts => pruneStale(ts))

  /** Delete every app-stamped dir under the scratch root (and under
    * oracle_base) more than [[StaleMs]] older than `myTs`. Split from
    * [[housekeep]] so the deletion logic is testable without the
    * once-per-JVM latch — and parameterized on the base dir so the
    * TEST prunes a sandbox tree, never the real scratch root: the
    * spec's synthetic far-future `myTs` would otherwise delete every
    * LIVE dump on the machine, breaking a concurrent or just-exited
    * Verify run's DuckDB compare (observed r11: a test suite running
    * beside a Verify wiped its oracle base mid-gate).
    */
  private[graft] def pruneStale(myTs: Long,
      base: java.io.File = new java.io.File(Base)): Unit = {
    def prune(parent: java.io.File): Unit = {
      val kids = parent.listFiles()
      if (kids != null) kids.foreach { d =>
        if (d.isDirectory &&
            appTs(d.getName).exists(ts => myTs - ts > StaleMs))
          deleteRecursively(d.toPath)
      }
    }
    prune(base.getParentFile)
    prune(base)
  }

  /** Best-effort recursive delete; walk stream closed via Using
    * (an unclosed Files.walk leaks a directory handle — ADVICE r7).
    */
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
      st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
    } catch { case _: java.io.IOException => () }
  /** Placeholder-form root for the static SQL strings. */
  val SqlRoot = s"$Base/${Placeholder}__$AppIdPlaceholder"
  /** Bind both placeholders for session `s` against `dir` — the one
    * substitution [[Verify]] applies before writing oracle_sql.json.
    */
  def bind(sql: String, s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    sql.replace(Placeholder, slug(dir))
      .replace(AppIdPlaceholder, s.sparkContext.applicationId)
}
