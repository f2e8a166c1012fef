package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for ingested parquet directories — the
  * maintenance pass every spool-style ingest needs at scale: per-batch
  * appends (one file per micro-batch per partition) degrade scans into
  * footer-read storms; rewriting to ~target-sized files restores them.
  *
  * Swap protocol: write to a sibling `.compact.tmp`, then delete +
  * rename. On a real deployment pair this with a table format or a
  * read-path manifest for atomicity; for spool warehouses (single
  * writer, append-only between compactions) the window is benign.
  */
object Compact {

  /** Rewrite `dir` into ceil(bytes/targetBytes) files. Returns
    * (filesBefore, filesAfter, rows).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(dir + ".compact.tmp")
    val df = spark.read.parquet(dir)
    val rows = df.count()
    df.repartition(n).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    if (!fs.rename(tmp, path))
      sys.error(s"compact: rename $tmp -> $path failed")
    (before.length, dataFiles().length, rows)
  }
}
