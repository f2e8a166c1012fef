package graft

import org.apache.spark.sql.functions._

/** Scale-path evidence (SURVEY.md §5): bucketed tables co-locate join
  * keys at write time, so a fact-fact join runs with NO shuffle
  * exchange — the plan shape that survives a 100x scale-up where a
  * shuffled join becomes the bottleneck.
  */
class BucketingSpec extends SparkSuite {

  private def rmrf(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
    // the in-memory catalog is per-JVM; clear leftover table dirs from
    // previous test runs or CREATE TABLE refuses the existing location
    rmrf("spark-warehouse/graft_li_bucketed")
    rmrf("spark-warehouse/graft_orders_bucketed")
    Tables.t(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_bucketed")
    Tables.t(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_orders_bucketed")

    // force sort-merge (test data is broadcast-small, real fact-fact
    // joins are not) so the bucketed no-exchange path is exercised
    val joined = spark.table("graft_li_bucketed").hint("merge")
      .join(spark.table("graft_orders_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))

    // one action to let AQE finalize the plan, then inspect it
    val expected = Tables.t(spark, sfDir, "lineitem")
      .join(Tables.t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(_.toString).sorted
    val got = joined.collect().map(_.toString).sorted
    assert(got.sameElements(expected))

    // AQE stage boundaries hide subtrees from collect(); assert on the
    // rendered final plan instead
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
    assert(!planStr.contains("Exchange hashpartitioning(l_orderkey") &&
      !planStr.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle its inputs:\n$planStr")
    assert(planStr.contains("SelectedBucketsCount: 8 out of 8"),
      s"expected bucketed scans:\n$planStr")
  }
}
