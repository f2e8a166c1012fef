package graft

import org.apache.spark.sql.functions._

/** Sketch prefilter contract: the sketch may only ADD candidates
  * (no false negatives); the exact verify must remove every false
  * positive — so each sketch query equals its sketch-free twin.
  */
class SketchSpec extends SparkSuite {

  test("bloom semi-join equals the plain semi-join") {
    val got = q("q42_bloom_semijoin", sfDir).collect()
    val keys = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val want = Tables.t(spark, sfDir, "lineitem")
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag")).collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("cms heavy hitters equal the exact threshold aggregation") {
    val got = q("q43_cms_heavy_hitters", sfDir).collect()
    val li = Tables.t(spark, sfDir, "lineitem").select(col("l_suppkey"))
    val tot = li.agg(count(lit(1)).as("t"),
      countDistinct(col("l_suppkey")).as("k")).head()
    val want = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .filter(lit(20L) * col("cnt") * tot.getLong(1) >=
        lit(21L) * tot.getLong(0))
      .orderBy(col("l_suppkey")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("hll union: exact counts match recompute and every bracket flag is 1") {
    val rows = q("q44_hll_union", sfDir).collect()
    assert(rows.nonEmpty)
    // the within_tol flag IS the estimate check (the entry brackets its
    // own HLL estimate against the exact count; oracle pins it to 1)
    rows.foreach(r => assert(r.getAs[Long]("within_tol") == 1L,
      s"${r.getAs[String]("day")}: HLL estimate outside 10% bracket"))
    val got = rows
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("exact_users")).toMap
    val ev = Tables.t(spark, sfDir, "events")
    assert(got("__ALL__") ==
      ev.select(col("user_id")).distinct().count())
    val exactDay = ev
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("n")).toMap
    exactDay.foreach { case (day, exact) =>
      assert(got(day) == exact, s"$day: ${got(day)} vs exact $exact")
    }
  }

  test("approx distinct: exact counts match and every bracket flag is 1") {
    val rows = q("q28_approx_distinct", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("within_tol") == 1L,
      s"${r.getString(0)}: HLL++ estimate outside 15% bracket"))
    val got = rows
      .map(r => r.getString(0) -> r.getAs[Long]("exact_users")).toMap
    val exact = Tables.t(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got == exact)
  }

  test("approx quantile estimates land inside a ±2-rank bracket of exact") {
    val rows = q("q62_approx_quantile", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      // the within_tol flag is the ±2-percentile-rank bracket check,
      // computed in-plan against the exact ranked distribution
      assert(r.getAs[Long]("within_tol") == 1L,
        s"$et: an approx_percentile estimate escaped its rank bracket")
      // exact discrete percentiles must be monotone and real data values
      val (p50, p90, p99) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"$et: non-monotone $p50 $p90 $p99")
    }
  }

  test("bm25 scores the query-term-rich fixture docs highest") {
    val rows = q("text_bm25", Fixtures.dir).collect()
    assert(rows.nonEmpty)
    // scores strictly ordered desc with doc_id tiebreak; all positive
    val scores = rows.map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(scores.forall(_._1 > 0))
    assert(scores.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    // doc 3 contains none of "the"/"data"/"and"? it has neither "the"
    // nor "and" nor "data" -> must be absent from results
    val base = Fixtures.baseText.split(" ")
    assert(base.contains("the")) // fixture sanity
    // docs 0..2 contain "the" 4x -> they must outrank doc 5 (no terms)
    val ids = rows.map(_.getAs[Long]("doc_id")).toSeq
    assert(Seq(0L, 1L, 2L).forall(ids.contains))
    assert(!ids.contains(5L), "doc with no query terms must not score")
  }
}
