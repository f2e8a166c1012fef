package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing split for knn_graph (VERDICT r16 #1): the wall
  * exponent at the sf10→sf30 step measured ~1.97 while candidate
  * volume and routing flops both measured exactly n^1.5 (index_stats
  * arithmetic, SURVEY §18) — this main attributes the residual by
  * timing the four stages independently, each min-of-N over the SAME
  * cached index the bench entry serves from:
  *
  *   route  — probe explode + top-4 cell routing (map-only)
  *   scan   — + cell join + dot-product scoring (reduced by a cheap
  *            single-key sum so no top-k state is involved)
  *   topk   — + the k-bounded partial TopKAgg and its qid shuffle
  *   mutual — + reciprocation join and output ordering (the entry)
  *
  * Stage costs are CUMULATIVE (each materializes its prefix), so the
  * per-stage attribution is the successive difference. The optional
  * `--sortagg` A/B re-times the topk stage under
  * spark.sql.execution.useObjectHashAggregateExec=false, swapping the
  * hash-partial TopKAgg (suspected last-level-cache thrash: one
  * buffer per distinct qid probing each task's ~4n/P-entry map) for a
  * SortAggregate whose working set is one qid at a time.
  *
  * Usage: java -cp ... graft.KnnGraphStages <sfDir> [<sfDir2> ...]
  *        [--reps N] [--sortagg]
  */
object KnnGraphStages {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10")
    val reps = DiagArgs.intFlag(args, "--reps").getOrElse(3)
    val forceParts = DiagArgs.intFlag(args, "--parts")
    val sortAb = args.contains("--sortagg")
    val selfJoin = args.contains("--selfjoin")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(f: => Unit): Double = (1 to reps).map { _ =>
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }.min

    for (dir <- dirs) {
      // index build is untimed deployment setup, as in Bench
      SimilarityOps.warmCaches(spark, dir)
      val p = SimilarityOps.knnGraphPlan(spark, dir, forceParts,
        selfJoinMutual = selfJoin)
      // one untimed full pass first: JIT + shuffle-file page cache
      p.mutual.count()
      val route = best(p.probes.count())
      val scan = best(p.scored.agg(sum(col("sim"))).collect())
      val topk = best(p.top.count())
      val mutual = best(p.mutual.count())
      println(f"STAGES $dir parts=${forceParts.getOrElse(0)} " +
        f"selfjoin=$selfJoin reps=$reps route=$route%.2f " +
        f"scan=$scan%.2f topk=$topk%.2f mutual=$mutual%.2f " +
        f"(d_scan=${scan - route}%.2f d_topk=${topk - scan}%.2f " +
        f"d_mutual=${mutual - topk}%.2f)")
      if (sortAb) {
        val key = "spark.sql.execution.useObjectHashAggregateExec"
        spark.conf.set(key, "false")
        try {
          val sortTopk = best(p.top.count())
          println(f"STAGES $dir sortagg_topk=$sortTopk%.2f " +
            f"(hash=$topk%.2f)")
        } finally spark.conf.set(key, "true")
      }
    }
    spark.stop()
  }
}
