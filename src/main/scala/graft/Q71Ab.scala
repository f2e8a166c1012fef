package graft

import org.apache.spark.sql.SparkSession

/** q71_fuzzy_match length-bucket A/B (VERDICT r17 #6): time the
  * shipped FastSS variant-hash blocking against a variant key with
  * floor(len(c_name)/4) appended, at each given corpus. Prints both
  * min-of-reps walls plus the result-pair counts (they must match on
  * the fixtures — lengths are {18, 24}, so no true pair straddles a
  * div-4 boundary; see q71FuzzyMatch's lenBucket note for why the
  * bucketed key is unsound in general and expected inert here).
  *
  * Usage: java -cp ... graft.Q71Ab <sfDir> [<sfDir2> ...] [--reps N]
  */
object Q71Ab {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10u")
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

    def best(f: => Long): (Double, Long) = (1 to reps).map { _ =>
      val t0 = System.nanoTime
      val n = f
      ((System.nanoTime - t0) / 1e9, n)
    }.minBy(_._1)

    for (dir <- dirs) {
      // untimed warm pass (JIT + page cache), as in the other stages
      Analytics4.q71FuzzyMatch(spark, dir).count()
      val (tBase, nBase) =
        best(Analytics4.q71FuzzyMatch(spark, dir).count())
      val (tLen, nLen) = best(
        Analytics4.q71FuzzyMatch(spark, dir, lenBucket = true).count())
      println(f"Q71AB $dir reps=$reps base=$tBase%.2f len4=$tLen%.2f " +
        f"pairs_base=$nBase pairs_len4=$nLen " +
        f"match=${nBase == nLen}")
    }
    spark.stop()
  }
}
