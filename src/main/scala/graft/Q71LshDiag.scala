package graft

import org.apache.spark.sql.SparkSession

/** q71_fuzzy_lsh recall + wall measurement at gate scales (VERDICT
  * r19 #2): per corpus dir, prints the per-distance recall table
  * (ground truth = the recall-1 exact path) and the solo walls of the
  * exact vs LSH entries, so SURVEY §22 carries measured numbers
  * instead of s-curve theory. Diagnostic main, not library surface.
  *
  * Usage: runMain graft.Q71LshDiag target/sf10u [--reps 3]
  */
object Q71LshDiag {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10u")
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
      // warm the signature store untimed (the standing-index
      // contract; Bench's min-of-k self-warms the same way)
      Analytics4.q71FuzzyLsh(spark, dir).count()
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
      val (lshSec, lshRows) =
        minOf(Analytics4.q71FuzzyLsh(spark, dir).count())
      val (exactSec, exactRows) =
        minOf(Analytics4.q71FuzzyMatch(spark, dir).count())
      println(f"Q71LSH dir=$dir exact=$exactSec%.1fs/$exactRows rows " +
        f"lsh=$lshSec%.1fs/$lshRows rows")
      q71recall(spark, dir)
      Scratch.drain(spark)
      IndexCache.evictCorpus(spark, dir)
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
