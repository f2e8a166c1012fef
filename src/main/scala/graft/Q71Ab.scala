package graft

import org.apache.spark.sql.SparkSession

/** q71_fuzzy_match A/B harness. Default (r19, VERDICT r18 #2): time
  * the SHIPPED shape (slim blocking join → distinct over all bucket
  * co-occurrences → two name-lookup joins → banded-lev) against the
  * inline-verify variant (names carried through the blocking join,
  * lev before any dedup — measured SLOWER, ledgered §21), at each
  * given corpus, asserting identical output pair counts.
  * `--lenbucket` switches the B side to the r17 length-bucket
  * variant key instead (the §20 ledger; unsound in general).
  *
  * Usage: java -cp ... graft.Q71Ab <sfDir> [<sfDir2> ...] [--reps N]
  *        [--lenbucket]
  */
object Q71Ab {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10u")
    val reps = DiagArgs.intFlag(args, "--reps").getOrElse(3)
    val lenAb = args.contains("--lenbucket")
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
      val (bLabel, (tB, nB)) =
        if (lenAb) "len4" ->
          best(Analytics4.q71FuzzyMatch(spark, dir, lenBucket = true)
            .count())
        else "inline" ->
          best(Analytics4.q71FuzzyMatch(spark, dir, inlineVerify = true)
            .count())
      println(f"Q71AB $dir reps=$reps shipped=$tBase%.2f " +
        f"$bLabel=$tB%.2f pairs_shipped=$nBase pairs_b=$nB " +
        f"match=${nBase == nB}")
    }
    spark.stop()
  }
}
