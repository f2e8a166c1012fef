package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Small-file compaction for ingested parquet directories — the
  * maintenance pass every spool-style ingest needs at scale: per-batch
  * appends (one file per micro-batch per partition) degrade scans into
  * footer-read storms; rewriting to ~target-sized files restores them.
  *
  * Swap protocol (every step an atomic same-fs rename, so a crash at
  * ANY point leaves a complete copy recoverable by the next run):
  *   1. rewrite into `dir.compact.tmp`
  *   2. rename `dir` → `dir.compact.old`
  *   3. rename `dir.compact.tmp` → `dir`
  *   4. delete `dir.compact.old`
  * Recovery: `.old` + `.tmp` present ⇒ crashed between 2 and 3
  * (finish: tmp→dir, drop old); `.old` + `dir` ⇒ crashed before 4
  * (drop old); `.tmp` + `dir` ⇒ crashed mid-write (drop tmp). On a
  * real deployment pair this with a table format or read-path manifest
  * for reader atomicity; for spool warehouses (single writer,
  * append-only between compactions) the reader window is benign.
  */
object Compact {

  /** Ingest-batch file names promoted by `Spool.idempotentAppend`:
    * `batch_<32-hex queryId>_<batchId>_<i>.parquet`, or the pre-r13
    * legacy `batch_<batchId>_<i>.parquet` (no namespace).
    */
  private val BatchFile =
    "^batch_(?:([0-9a-f]{32})_)?([0-9]+)_[0-9]+\\.parquet$".r

  /** The NEWEST ingest batch of each checkpoint namespace must survive
    * compaction verbatim: it is the only batch a crashed-but-uncommitted
    * stream can replay on restart, and the replay dedups by DELETING its
    * own `batch_<ns>_<id>_*` files before re-promoting — rename those to
    * `part-*` and the replay turns into row duplication (ADVICE r12).
    * Every OLDER batch is provably committed (the streaming commit log
    * records batch N before batch N+1 ever writes a file), so compacting
    * them is always safe — making Compact safe to run at ANY point,
    * including between a crash and the recovering restart.
    *
    * Only namespaces that can still REPLAY need this exemption: a
    * retired checkpoint (deleted, or drained-and-abandoned) will never
    * replay its newest batch, so preserving it forever just accretes
    * one permanently-uncompactable batch per historical lifetime
    * (ADVICE r13). Callers that know the live set pass it via
    * `liveNamespaces`; `None` preserves every namespace (the safe
    * default when the caller cannot enumerate live checkpoints). The
    * legacy pre-r13 "" namespace's newest batch is ALWAYS preserved,
    * listed or not: before `Spool.migrateLegacyBatches` has run on a
    * just-upgraded deployment (e.g. a Compact in the crash→restart
    * window), that batch is still replayable under its legacy name, and
    * folding it into `part-*` would turn the replay into row
    * duplication (ADVICE r14). Migration retires the "" namespace on
    * the first post-upgrade ingest, after which nothing matches it and
    * the exemption is moot — so the cost of always keeping it is zero.
    */
  private def preservedBatchFiles(names: Seq[String],
      liveNamespaces: Option[Set[String]]): Set[String] = {
    val batches = names.flatMap {
      case n @ BatchFile(ns, id) =>
        Some((if (ns == null) "" else ns, id.toLong, n))
      case _ => None
    }
    val live = batches.groupBy(_._1).filter { case (ns, _) =>
      ns == "" || liveNamespaces.forall(_.contains(ns))
    }
    live.values.flatMap { g =>
      val newest = g.map(_._2).max
      g.collect { case (_, id, n) if id == newest => n }
    }.toSet
  }

  /** Rewrite `dir` into ceil(bytes/targetBytes) files. Returns
    * (filesBefore, filesAfter, rows); (0, 0, 0) for a missing or
    * parquet-less directory (a sensor that never alerted is normal,
    * not an error — a multi-spool maintenance run must not abort).
    * `rows` counts the rewritten rows only — the preserved newest
    * ingest batches (see [[preservedBatchFiles]]) are carried over
    * byte-for-byte, not re-read. `liveNamespaces`: the checkpoint
    * namespaces (`Spool.checkpointNamespace` values) that may still
    * replay into this directory — only THEIR newest batches are
    * preserved; `None` (default) preserves every namespace's.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20,
      liveNamespaces: Option[Set[String]] = None): (Int, Int, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".compact.tmp")
    val old = new Path(dir + ".compact.old")

    // crash recovery, per the swap protocol above
    if (fs.exists(old)) {
      if (!fs.exists(path)) {
        val done = if (fs.exists(tmp)) fs.rename(tmp, path)
          else fs.rename(old, path) // defensive: tmp also lost ⇒ keep old
        if (!done) sys.error(s"compact: recovery rename into $path failed")
      }
      fs.delete(old, true)
    } else if (fs.exists(tmp) && !fs.exists(path)) {
      // tmp is the ONLY copy (a delete-then-rename-era crash left it):
      // it is always a complete rewrite — roll it forward, never drop
      if (!fs.rename(tmp, path))
        sys.error(s"compact: recovery rename $tmp -> $path failed")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true) // crash mid-write: incomplete

    def dataFiles() = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (!fs.exists(path)) return (0, 0, 0L)
    val before = dataFiles()
    if (before.isEmpty) return (0, 0, 0L)
    val preserved = preservedBatchFiles(
      before.map(_.getPath.getName).toSeq, liveNamespaces)
    val compactable = before.filterNot(st => preserved(st.getPath.getName))
    if (compactable.isEmpty) return (before.length, before.length, 0L)

    val totalBytes = compactable.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // observe() rides the rewrite job: row count with no second scan
    val obs = Observation()
    spark.read.parquet(compactable.map(_.getPath.toString).toIndexedSeq: _*)
      .observe(obs, count(lit(1)).as("rows"))
      .repartition(n).write.mode("overwrite").parquet(tmp.toString)
    val rows = obs.get("rows").asInstanceOf[Long]
    // carry the preserved newest batches into the replacement dir as
    // COPIES (a rename here would leave `dir` incomplete if we crash
    // before the swap; the originals die with `.old` after it)
    val conf = spark.sparkContext.hadoopConfiguration
    before.filter(st => preserved(st.getPath.getName)).foreach { st =>
      if (!org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new Path(tmp, st.getPath.getName), false, conf))
        sys.error(s"compact: preserving copy of ${st.getPath} failed")
    }
    if (!fs.rename(path, old))
      sys.error(s"compact: rename $path -> $old failed")
    if (!fs.rename(tmp, path))
      sys.error(s"compact: rename $tmp -> $path failed")
    fs.delete(old, true)
    (before.length, dataFiles().length, rows)
  }
}
