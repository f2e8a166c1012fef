package graft

/** Temporary placeholders — each module is filled in as its SURVEY.md §2
  * section lands. Keeping them separate lets Registry stay stable.
  */
object TextOps { def entries: Seq[Entry] = Seq.empty }
object DedupOps { def entries: Seq[Entry] = Seq.empty }
object SimilarityOps { def entries: Seq[Entry] = Seq.empty }
object SnortOps { def entries: Seq[Entry] = Seq.empty }
object StreamOps { def entries: Seq[Entry] = Seq.empty }
