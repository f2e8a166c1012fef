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

  test("hll union estimate within 5% of exact distinct counts") {
    val rows = q("q44_hll_union", sfDir).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("est_users")).toMap
    val ev = Tables.t(spark, sfDir, "events")
    val exactAll = ev.select(col("user_id")).distinct().count()
    val estAll = rows("__ALL__")
    assert(math.abs(estAll - exactAll).toDouble / exactAll < 0.05,
      s"union estimate $estAll vs exact $exactAll")
    val exactDay = ev
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("n")).toMap
    exactDay.foreach { case (day, exact) =>
      val est = rows(day)
      assert(math.abs(est - exact).toDouble / math.max(exact, 1) < 0.05,
        s"$day: est $est vs exact $exact")
    }
  }

  test("approx quantile estimates land inside a ±2-rank bracket of exact") {
    import org.apache.spark.sql.functions._
    val approx = q("q62_approx_quantile", sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Tables.t(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, array(0.48, 0.52))").as("b50"),
        expr("percentile(value, array(0.88, 0.92))").as("b90"),
        expr("percentile(value, array(0.97, 1.0))").as("b99"))
      .collect()
    assert(exact.nonEmpty && approx.nonEmpty)
    exact.foreach { r =>
      val et = r.getString(0)
      val (p50, p90, p99) = approx(et)
      def bracket(i: Int): (Double, Double) = {
        val s = r.getSeq[Double](i); (s.head, s.last)
      }
      val (l50, h50) = bracket(1)
      val (l90, h90) = bracket(2)
      val (l99, h99) = bracket(3)
      assert(p50 >= l50 && p50 <= h50, s"$et p50 $p50 not in [$l50,$h50]")
      assert(p90 >= l90 && p90 <= h90, s"$et p90 $p90 not in [$l90,$h90]")
      assert(p99 >= l99 && p99 <= h99, s"$et p99 $p99 not in [$l99,$h99]")
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
