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

  /** Rewrite `dir` into ceil(bytes/targetBytes) files. Returns
    * (filesBefore, filesAfter, rows); (0, 0, 0) for a missing or
    * parquet-less directory (a sensor that never alerted is normal,
    * not an error — a multi-spool maintenance run must not abort).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int, Long) = {
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

    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // observe() rides the rewrite job: row count with no second scan
    val obs = Observation()
    spark.read.parquet(dir)
      .observe(obs, count(lit(1)).as("rows"))
      .repartition(n).write.mode("overwrite").parquet(tmp.toString)
    val rows = obs.get("rows").asInstanceOf[Long]
    if (!fs.rename(path, old))
      sys.error(s"compact: rename $path -> $old failed")
    if (!fs.rename(tmp, path))
      sys.error(s"compact: rename $tmp -> $path failed")
    fs.delete(old, true)
    (before.length, dataFiles().length, rows)
  }
}
