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
  /** Runtime dump root for entries writing against `dir` from session
    * `s` — unique per (corpus, JVM).
    */
  def root(s: org.apache.spark.sql.SparkSession, dir: String): String =
    s"$Base/${slug(dir)}__${s.sparkContext.applicationId}"
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
