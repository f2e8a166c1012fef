package graft

import org.apache.spark.sql.functions._

/** Scale-path evidence (SURVEY.md §5): a day-partitioned fact layout
  * prunes non-matching partitions AT PLANNING — the mechanism that lets
  * a one-day query over 100 TB of history touch one day's files.
  */
class PartitionPruningSpec extends SparkSuite {

  test("day-partitioned write prunes partitions on read") {
    val out = "target/events_by_day"
    val ev = Tables.t(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    val oneDay = ev.select(min(col("day"))).head().getString(0)

    val nDays = ev.select(col("day")).distinct().count()
    val read = spark.read.parquet(out).filter(col("day") === oneDay)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filter:\n$plan")
    assert(read.count() == ev.filter(col("day") === oneDay).count())
    // the executed scan must have LISTED only the matching partition:
    // one day's file(s), not all of them (inputFiles would lie here —
    // it reflects the unpruned relation)
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail(s"no file scan in:\n$plan"))
    val nFiles = scan.metrics("numFiles").value
    assert(nDays > 1 && nFiles < nDays,
      s"scan read $nFiles files for 1 of $nDays partitions")
  }
}
