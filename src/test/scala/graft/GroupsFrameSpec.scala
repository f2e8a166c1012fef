package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q55's aggregate-then-ROWS composition implements true SQL:2011
  * GROUPS frame semantics: `GROUPS BETWEEN 1 PRECEDING AND CURRENT
  * ROW` sums the previous PEER GROUP (previous existing day), not the
  * previous calendar day — the distinction only visible on SPARSE
  * days, which the sf tables don't have. Planted gap here.
  */
class GroupsFrameSpec extends SparkSuite {

  test("previous peer group is summed across a calendar gap") {
    import spark.implicits._
    // day 1: 10+20, day 2: 5, day 5 (gap!): 7, day 6: 1
    val rows = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-01", 20.0),
      ("a", "2024-01-02", 5.0),
      ("a", "2024-01-05", 7.0),
      ("a", "2024-01-06", 1.0)).toDF("g", "day", "v")
    val daily = rows.groupBy(col("g"), col("day"))
      .agg(sum(col("v")).as("day_rev"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(-1, Window.currentRow)
    val got = daily.withColumn("rev2", sum(col("day_rev")).over(w))
      .orderBy(col("day"))
      .select(col("day"), col("rev2")).as[(String, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 30.0),
      ("2024-01-02", 35.0),
      // GROUPS semantics: previous peer group is Jan 2 (5.0), NOT the
      // empty calendar-previous Jan 4 a RANGE INTERVAL frame would use
      ("2024-01-05", 12.0),
      ("2024-01-06", 8.0)))
  }
}
