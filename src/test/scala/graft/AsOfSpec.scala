package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join picks the greatest right ts <= left ts, per key") {
    val purchases = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L),
      (4L, 30L, 500L))
      .toDF("event_id", "user_id", "p_us")
    val signups = Seq((101L, 10L, 90L), (102L, 10L, 240L), (103L, 10L, 260L),
      (104L, 30L, 600L))
      .toDF("s_event_id", "s_user_id", "s_us")
    val got = AsOf.join(purchases, signups, Seq("user_id"), "p_us",
        Seq("s_user_id"), "s_us")
      .select(col("event_id"), col("s_event_id"), col("s_us"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("s_event_id")).map(_.toLong)))
    assert(got.toSeq == Seq(
      1L -> Some(101L), // 90 <= 100 < 240
      2L -> Some(102L), // 240 <= 250 < 260
      3L -> None,       // user 20 has no signup
      4L -> None))      // user 30's only signup is later (600 > 500)
  }

  test("as-of join equals the O(n*m) declarative equivalent on real data") {
    val got = q("q29_asof_join", sfDir).collect()
    val ev = Tables.t(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("p_us"))
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("s_event_id"),
        unix_micros(col("ts").cast("timestamp")).as("s_us"))
    val want = p.join(sg, col("user_id") === col("s_user_id") &&
        col("s_us") <= col("p_us"), "left_outer")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("s_us").desc_nulls_last, col("s_event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("p_us"),
        col("s_event_id"), col("s_us"))
      .orderBy(col("event_id"))
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("as-of join handles ts ties (right row at exactly left ts matches)") {
    val l = Seq((1L, 5L, 100L)).toDF("event_id", "user_id", "p_us")
    val r = Seq((9L, 5L, 100L)).toDF("s_event_id", "s_user_id", "s_us")
    val got = AsOf.join(l, r, Seq("user_id"), "p_us",
      Seq("s_user_id"), "s_us").collect()
    assert(got.head.getAs[Long]("s_event_id") == 9L)
  }

  test("forward as-of picks the smallest right ts >= left ts, per key") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 400L))
      .toDF("event_id", "user_id", "p_us")
    val r = Seq((101L, 10L, 120L), (102L, 10L, 300L))
      .toDF("s_event_id", "s_user_id", "s_us")
    val got = AsOf.joinForward(l, r, Seq("user_id"), "p_us",
        Seq("s_user_id"), "s_us")
      .orderBy(col("event_id")).collect()
      .map(r0 => (r0.getAs[Long]("event_id"),
        Option(r0.getAs[java.lang.Long]("s_event_id")).map(_.toLong)))
    assert(got.toSeq == Seq(
      1L -> Some(101L), // 120 is the first signup at/after 100
      2L -> Some(102L), // 300 >= 250
      3L -> None))      // nothing at/after 400
  }

  test("NULL ts/keys are excluded from matching, like DuckDB ASOF") {
    val l = Seq(
      (1L, Option(5L), Option(100L)), // normal: matches r 9
      (2L, Option(5L), None),         // null left ts -> no match
      (3L, None, Option(100L)))       // null left key -> no match
      .toDF("event_id", "user_id", "p_us")
    val r = Seq(
      (8L, Option(5L), None),         // null right ts: never a candidate
      (9L, Option(5L), Option(90L)),
      (10L, None, Option(50L)))       // null right key: never a candidate
      .toDF("s_event_id", "s_user_id", "s_us")
    val got = AsOf.join(l, r, Seq("user_id"), "p_us",
        Seq("s_user_id"), "s_us")
      .select(col("event_id"), col("s_event_id"))
      .orderBy(col("event_id")).collect()
      .map(r0 => (r0.getAs[Long]("event_id"),
        Option(r0.getAs[java.lang.Long]("s_event_id")).map(_.toLong)))
    assert(got.toSeq == Seq(1L -> Some(9L), 2L -> None, 3L -> None))
  }

  test("non-long ts columns are rejected up front") {
    val l = Seq((1L, 5L, 100)).toDF("event_id", "user_id", "p_us") // Int ts
    val r = Seq((9L, 5L, 90L)).toDF("s_event_id", "s_user_id", "s_us")
    val err = intercept[IllegalArgumentException](
      AsOf.join(l, r, Seq("user_id"), "p_us", Seq("s_user_id"), "s_us"))
    assert(err.getMessage.contains("must be LONG/TIMESTAMP"))
  }
}
