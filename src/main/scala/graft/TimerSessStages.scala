package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-stage timing split for stream_timer_sessions (VERDICT r17 #3),
  * the knn_graph treatment: the entry is the streaming surface's most
  * expensive (131 s in-suite at sf30, 25 s solo at sf10) and its cost
  * had only ever been adjudicated "structural" in aggregate. Stages:
  *
  *   prep     — events min/max + the 4 time-ordered bucket-file
  *              writes (each coalesce(1) — a deliberate 1-task write
  *              per quarter, see timerSessPrep's ordering contract)
  *   stream   — the transformWithState drain itself: 4 micro-batches
  *              over the RocksDB provider, event-time timers, 8 state
  *              partitions, executor-side parquet sink
  *   readback — reading the drained parquet back and the entry's
  *              final (user_id, start_us) sort
  *
  * Unlike KnnGraphStages these stages are SEQUENTIAL, not cumulative:
  * each rep re-runs prep (fresh root) then stream (fresh checkpoint)
  * then readback, and the printed numbers are per-stage minima over
  * reps — the decade exponent of each stage is what VERDICT r17 #3
  * asks for.
  *
  * Usage: java -cp ... graft.TimerSessStages <sfDir> [<sfDir2> ...]
  *        [--reps N]
  */
object TimerSessStages {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10")
    val reps = DiagArgs.intFlag(args, "--reps").getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime
      val v = f
      ((System.nanoTime - t0) / 1e9, v)
    }

    for (dir <- dirs) {
      // one untimed full pass first: JIT + page cache, as in Bench
      StreamOps.timerSessionsDrain(spark, dir, checkpointed = false)
        ._1.orderBy(col("user_id"), col("start_us")).count()
      var (pMin, sMin, rMin, tMin) =
        (Double.MaxValue, Double.MaxValue, Double.MaxValue, Double.MaxValue)
      var rows = 0L
      (1 to reps).foreach { _ =>
        val (p, root) = timed(StreamOps.timerSessPrep(spark, dir))
        val (st, drained) = timed(
          StreamOps.timerSessStream(spark, root, checkpointed = false)._1)
        val (r, n) = timed(
          drained.orderBy(col("user_id"), col("start_us")).count())
        pMin = math.min(pMin, p); sMin = math.min(sMin, st)
        rMin = math.min(rMin, r); tMin = math.min(tMin, p + st + r)
        rows = n
      }
      println(f"TIMERSTAGES $dir reps=$reps prep=$pMin%.2f " +
        f"stream=$sMin%.2f readback=$rMin%.2f total=$tMin%.2f rows=$rows")
    }
    spark.stop()
  }
}
