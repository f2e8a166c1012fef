package graft

/** Location scheme for the oracle-base dumps (the candidate-generation
  * intermediates DuckDB re-derives downstream logic from). Dumps are
  * scoped BY CORPUS DIR: the `oracleSql` strings are built statically
  * (no dir in scope), so they bake in a literal placeholder and
  * [[Verify]] substitutes the actual corpus slug when it writes
  * `oracle_sql.json`. Without the scoping, any entry invocation
  * against another dir between Verify and the DuckDB compare — a
  * ScalaTest suite on the planted fixtures, a bench at another SF —
  * silently overwrote the shared paths and failed the gate.
  */
object OracleDumps {
  val Base = "/root/repo/target/graft_scratch/oracle_base"
  /** Literal token inside static SQL strings. */
  val Placeholder = "__GRAFT_SF_SLUG__"
  def slug(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")
  /** Runtime dump root for entries writing against `dir`. */
  def root(dir: String): String = s"$Base/${slug(dir)}"
  /** Placeholder-form root for the static SQL strings. */
  val SqlRoot = s"$Base/$Placeholder"
}
