package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measured state-store plateau for the timer-session pipeline
  * (VERDICT r18 #5): drain an event corpus through transformWithState
  * on RocksDB under a 3× LONGER drain than the bench entry (12
  * watermark ratchets instead of 4) and print per-batch resident
  * state straight from the engine's StateOperatorProgress —
  * numRowsTotal (sessions resident), numRowsRemoved (timer
  * evictions), and the RocksDB SST footprint. "Plateau" is the
  * SURVEY §5 claim made measurable: resident rows track the OPEN
  * sessions of each watermark window, so tripling the number of
  * micro-batches over the same corpus must NOT triple peak resident
  * state — corpus history leaves the store as its timers fire.
  *
  * Usage: java -cp ... graft.SessPlateau <sfDir> [...] [--buckets K]
  */
object SessPlateau {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10")
    val buckets = DiagArgs.intFlag(args, "--buckets").getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (batchId, rowsTotal, rowsUpdated, rowsRemoved, sstBytes)
    val batches =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.stateOperators.nonEmpty) {
          val so = p.stateOperators(0)
          // the on-disk footprint metric's exact key varies by Spark
          // version — take the first Sst/FileSize-ish custom metric
          import scala.jdk.CollectionConverters._
          val sst = so.customMetrics.asScala.collectFirst {
            case (k, v) if k.contains("SstFile") || k.contains("sstFile")
              || k == "rocksdbTotalSstFilesBytes" => v.longValue
          }.getOrElse(-1L)
          batches.synchronized {
            batches += ((p.batchId, so.numRowsTotal, so.numRowsUpdated,
              so.numRowsRemoved, sst))
          }
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    for (dir <- dirs) {
      batches.synchronized(batches.clear())
      val root = StreamOps.timerSessPrep(spark, dir, buckets)
      val t0 = System.nanoTime
      val closed = StreamOps
        .timerSessStream(spark, root, checkpointed = false)._1.count()
      val secs = (System.nanoTime - t0) / 1e9
      val users = Tables.t(spark, dir, "events")
        .select("user_id").distinct().count()
      val hist = batches.synchronized(batches.sortBy(_._1).toVector)
      println(f"SESSPLATEAU dir=$dir buckets=$buckets closed=$closed " +
        f"users=$users stream_secs=$secs%.1f")
      hist.foreach { case (b, tot, upd, rem, sst) =>
        println(f"SESSPLATEAU batch=$b%3d rows_total=$tot%9d " +
          f"updated=$upd%9d removed=$rem%9d sst_bytes=$sst%12d")
      }
      if (hist.size >= 4) {
        val tots = hist.map(_._2)
        val h1 = tots.take(tots.length / 2).max
        val h2 = tots.drop(tots.length / 2).max
        println(f"SESSPLATEAU verdict peak_h1=$h1 peak_h2=$h2 " +
          f"h2_over_h1=${h2.toDouble / math.max(h1, 1)}%.2f " +
          f"peak_frac_of_users=${tots.max.toDouble / math.max(users, 1)}%.3f")
      }
    }
    spark.stop()
  }
}
