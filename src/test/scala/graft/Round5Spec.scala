package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics proofs for the round-5 operators on planted fixtures —
  * the edge cases the sf tables don't necessarily exercise: interval
  * merging across touching vs. overlapping spans, nearest-in-time tie
  * preference, IGNORE NULLS carry-forward before any non-null, and
  * streak islands across gaps.
  */
class Round5Spec extends SparkSuite {

  test("interval merge: touching intervals do NOT merge, overlapping do") {
    import spark.implicits._
    // [0,10] [5,15] overlap -> one island [0,15]; [15,25] touches at 15
    // (start == prev max end, not >) -> merges by our > rule? No:
    // new_island iff s > prevMax. s=15, prevMax=15 -> NOT new -> merges.
    // Closed-interval semantics: touching endpoints chain. [40,50] is
    // disjoint -> second island.
    val iv = Seq((1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 15L, 25L),
      (1L, 4L, 40L, 50L)).toDF("user_id", "event_id", "s", "e")
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val out = iv
      .withColumn("ni", when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("st"), max(col("e")).as("en"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("en") - col("st")).as("covered"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 35L))) // [0,25]=25 + [40,50]=10
  }

  test("fill-forward: NULL before the first non-null, carries after") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 10L, "view", 0.5), (1L, 2L, 20L, "purchase", 7.0),
      (1L, 3L, 30L, "view", 0.1), (1L, 4L, 40L, "purchase", 9.0),
      (1L, 5L, 50L, "click", 0.2))
      .toDF("user_id", "event_id", "us", "event_type", "value")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val got = ev.withColumn("lp",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .orderBy(col("us")).select(col("lp")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(None, Some(7.0), Some(7.0), Some(9.0), Some(9.0)))
  }

  test("nearest-event: tie between backward and forward prefers the earlier click") {
    import spark.implicits._
    // purchase at 100; clicks at 90 and 110 -> both 10 away -> pick 90
    val b = Seq((1L, 100L, Some(1L), Some(90L), Some(2L), Some(110L)),
      (2L, 100L, None, None, Some(3L), Some(130L)),
      (3L, 100L, Some(4L), Some(70L), None, None))
      .toDF("event_id", "us", "b_id", "b_us", "f_id", "f_us")
    val bDiff = col("us") - col("b_us")
    val fDiff = col("f_us") - col("us")
    val takeBack = col("f_us").isNull ||
      (col("b_us").isNotNull && bDiff <= fDiff)
    val got = b.select(col("event_id"),
        when(takeBack, col("b_id")).otherwise(col("f_id")).as("nid"),
        when(takeBack, bDiff).otherwise(fDiff).as("nd"))
      .orderBy(col("event_id"))
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some(1L), Some(10L)), (2L, Some(3L), Some(30L)),
      (3L, Some(4L), Some(30L))))
  }

  test("streaks: islands split on gaps, longest picks earliest on ties") {
    import spark.implicits._
    // days 1,2,3 | 7,8,9 -> two length-3 streaks; earliest start wins
    val d = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 7), (1L, 8), (1L, 9))
      .toDF("user_id", "day_num")
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
    val got = d.withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day_num")).as("start_day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(struct(col("len"), (-col("start_day")).as("neg"))).as("best"))
      .select(col("user_id"), col("n_streaks"), col("best.len"),
        (-col("best.neg")).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 1L)))
  }

  test("stream_upsert merge: batch splits don't change the final store") {
    import spark.implicits._
    // same user across batches, newer event in the second; a ts tie
    // broken by event_id; a user only in batch one
    val b1 = Seq((1L, 10L, 100L, "view"), (2L, 11L, 200L, "click"),
      (3L, 12L, 300L, "view")).toDF("user_id", "event_id", "us", "event_type")
    val b2 = Seq((1L, 20L, 150L, "purchase"), (2L, 21L, 200L, "error"))
      .toDF("user_id", "event_id", "us", "event_type")
    val chained = StreamOps.upsertCompact(
      StreamOps.upsertCompact(b1).unionByName(b2))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val direct = StreamOps.upsertCompact(b1.unionByName(b2))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(chained == direct)
    assert(chained == Seq((1L, 150L, 20L, "purchase"),
      (2L, 200L, 21L, "error"), (3L, 300L, 12L, "view")))
  }

  test("dedup_substring: shared long substring detected, disjoint docs are not") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"one two three $shared four five six seven"),
      (3L, "completely different content with no overlap whatsoever here"),
      (4L, "another unrelated document about entirely other things indeed"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.substringPairs(docs, minDf = 2, maxDf = 8,
        minShared = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"only the planted pair should surface: $pairs")
    assert(pairs.head._3 >= 3)
  }

  test("two-pass weighted median equals the one-pass window form on edges") {
    import spark.implicits._
    // group a: crossing row at a bucket boundary (price 2000 = start of
    // bucket 2) and an exact 2·cum = tot tie; group b: all in one bucket
    val rows = Seq(
      ("a", 500.0, 3L), ("a", 1500.0, 3L), ("a", 2000.0, 6L),
      ("a", 2100.0, 6L), ("a", 3999.0, 2L),
      ("b", 100.0, 1L), ("b", 150.0, 1L), ("b", 120.0, 5L))
      .zipWithIndex.map { case ((g, p, w), i) => (g, p, w, i.toLong) }
      .toDF("g", "price", "wt", "id")
    def onePass = {
      val wC = Window.partitionBy(col("g")).orderBy(col("price"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wT = Window.partitionBy(col("g"))
      rows.withColumn("cum", sum(col("wt")).over(wC))
        .withColumn("tot", sum(col("wt")).over(wT))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("g")).agg(min(col("price")).as("m"))
    }
    def twoPass = {
      val b = rows.withColumn("b", floor(col("price") / 1000).cast("long"))
      val wT = Window.partitionBy(col("g"))
      val wB = Window.partitionBy(col("g")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val target = b.groupBy(col("g"), col("b")).agg(sum(col("wt")).as("bw"))
        .withColumn("cum", sum(col("bw")).over(wB))
        .withColumn("tot", sum(col("bw")).over(wT))
        .withColumn("prev_cum", col("cum") - col("bw"))
        .filter(col("cum") * 2 >= col("tot") && col("prev_cum") * 2 < col("tot"))
        .select(col("g"), col("b"), col("prev_cum"), col("tot"))
      val wI = Window.partitionBy(col("g")).orderBy(col("price"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      b.join(broadcast(target), Seq("g", "b"))
        .withColumn("ci", sum(col("wt")).over(wI))
        .filter((col("prev_cum") + col("ci")) * 2 >= col("tot"))
        .groupBy(col("g")).agg(min(col("price")).as("m"))
    }
    val a = onePass.orderBy(col("g")).as[(String, Double)].collect().toSeq
    val c = twoPass.orderBy(col("g")).as[(String, Double)].collect().toSeq
    assert(a == c)
    assert(a == Seq(("a", 2000.0), ("b", 120.0)))
  }

  test("chained same-direction as-of joins reuse the left side's sort") {
    import spark.implicits._
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val l = Seq((1L, 100L), (1L, 200L), (2L, 150L))
        .toDF("k", "ts")
      val r1 = Seq((1L, 90L, "x"), (2L, 140L, "y"))
        .toDF("r1_k", "r1_ts", "r1_v")
      val r2 = Seq((1L, 95L, "p"), (2L, 100L, "q"))
        .toDF("r2_k", "r2_ts", "r2_v")
      val j = graft.plans.AsOf.join(
        graft.plans.AsOf.join(l, r1, Seq("k"), "ts", Seq("r1_k"), "r1_ts"),
        r2, Seq("k"), "ts", Seq("r2_k"), "r2_ts")
      assert(j.count() == 3)
      val sorts = j.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.size
      // one sort per INPUT side (l, r1, r2) — the second join reuses
      // the first's output ordering instead of re-sorting the probe
      assert(sorts == 3, s"expected 3 sorts, got $sorts")
    } finally spark.conf.set(aqeKey, prev)
  }

  test("text_chunk boundary math: exact cover, no empty chunks") {
    import spark.implicits._
    // len 150 -> 1 chunk; len 151 -> 2 chunks (second of length 1);
    // len 200 -> 2 chunks (second of length 50)
    val docs = Seq((1L, "x" * 150), (2L, "y" * 151), (3L, "z" * 200))
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), col("text"),
        expr("(length(text) + 149) DIV 150").as("n_chunks"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("ci"),
        col("text"))
      .select(col("doc_id"), col("ci").cast("long").as("ci"),
        length(expr("substring(text, ci * 150 + 1, 200)")).as("cl"))
      .orderBy(col("doc_id"), col("ci"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 150), (2L, 0L, 151), (2L, 1L, 1),
      (3L, 0L, 200), (3L, 1L, 50)))
    assert(got.forall(_._3 > 0))
  }
}
