package graft

/** Temporary placeholders — each module is filled in as its SURVEY.md §2
  * section lands. Keeping them separate lets Registry stay stable.
  */
object SnortOps { def entries: Seq[Entry] = Seq.empty }
object StreamOps { def entries: Seq[Entry] = Seq.empty }
