package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for ingested parquet directories — the
  * maintenance pass every spool-style ingest needs at scale: per-batch
  * appends (one file per micro-batch per partition) degrade scans into
  * footer-read storms; rewriting to ~target-sized files restores them.
  *
  * Swap protocol: write to a sibling `.compact.tmp`, then delete +
  * rename; an orphaned tmp from a crash between the two is rolled
  * FORWARD on the next invocation (the tmp is only ever a complete
  * rewrite). On a real deployment pair this with a table format or a
  * read-path manifest for reader atomicity; for spool warehouses
  * (single writer, append-only between compactions) that window is
  * benign.
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

    // crash recovery: a tmp without its source dir is a completed
    // rewrite whose swap lost the rename — finish it; a tmp WITH the
    // source dir is from a crash mid-write — discard it
    if (fs.exists(tmp)) {
      if (!fs.exists(path)) {
        if (!fs.rename(tmp, path))
          sys.error(s"compact: recovery rename $tmp -> $path failed")
      } else fs.delete(tmp, true)
    }

    def dataFiles() = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (!fs.exists(path)) return (0, 0, 0L)
    val before = dataFiles()
    if (before.isEmpty) return (0, 0, 0L)

    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(dir)
      .repartition(n).write.mode("overwrite").parquet(tmp.toString)
    // count the handful of compacted files, not the small-file storm
    // the pass exists to eliminate
    val rows = spark.read.parquet(tmp.toString).count()
    fs.delete(path, true)
    if (!fs.rename(tmp, path))
      sys.error(s"compact: rename $tmp -> $path failed")
    (before.length, dataFiles().length, rows)
  }
}
