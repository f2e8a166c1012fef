package graft

import org.apache.spark.sql.SparkSession

/** q71_fuzzy_capped recall + wall measurement at gate scales (VERDICT
  * r19 #2): per corpus dir, prints the per-distance recall table of
  * the SHIPPED cap (ground truth = the recall-1 exact path), the solo
  * walls of the exact vs capped entries, and a cap sweep
  * (candidate-pair volume + overall recall per cap) so SURVEY §22
  * carries measured numbers for the knob, not occupancy theory.
  * Diagnostic main, not library surface.
  *
  * Usage: runMain graft.Q71CapDiag target/sf10 [--reps 3]
  */
object Q71CapDiag {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10")
    val reps = DiagArgs.intFlag(args, "--reps").getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { dir =>
      // warm the bucket store untimed (the standing-index contract;
      // Bench's min-of-k self-warms the same way)
      Analytics4.q71FuzzyCapped(spark, dir).count()
      def minOf(f: => Long): (Double, Long) = {
        var best = Double.MaxValue
        var rows = 0L
        (0 until reps).foreach { _ =>
          val t0 = System.nanoTime()
          rows = f
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, rows)
      }
      val (capSec, capRows) =
        minOf(Analytics4.q71FuzzyCapped(spark, dir).count())
      val (exactSec, exactRows) =
        minOf(Analytics4.q71FuzzyMatch(spark, dir).count())
      println(f"Q71CAP dir=$dir exact=$exactSec%.1fs/$exactRows rows " +
        f"capped(cap=${Analytics4.Q71Cap})=$capSec%.1fs/$capRows rows")
      q71recall(spark, dir)
      // cap sweep: volume + overall recall per cap (truth counted once)
      val truth = exactRows
      Seq(2, 4, 8, 16, 1024).foreach { cap =>
        val t0 = System.nanoTime()
        val nCand = Analytics4.q71CappedCandidates(spark, dir, cap).count()
        val nOut = Analytics4.q71FuzzyCapped(spark, dir, cap).count()
        println(f"Q71SWEEP dir=$dir cap=$cap candidates=$nCand " +
          f"matched=$nOut recall=${nOut.toDouble / truth}%.4f " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
        IndexCache.evictCorpus(spark, dir)
      }
      Scratch.drain(spark)
    }
    spark.stop()
  }

  private def q71recall(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries("q71_recall_report")(spark, dir).collect()
      .foreach { r =>
        println(f"Q71RECALL dir=$dir dist=${r.getAs[Long]("dist")} " +
          f"n_pairs=${r.getAs[Long]("n_pairs")} " +
          f"n_recalled=${r.getAs[Long]("n_recalled")} " +
          f"recall=${r.getAs[Double]("recall")}%.4f")
      }
}
