package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edge semantics of the data-mix pair (mix_token_budget /
  * mix_epochs) on planted fixtures: the budget boundary is inclusive
  * and cuts mid-stream per source; epoch counts are ceil-division with
  * the ×4 cap actually binding.
  */
class MixOpsSpec extends SparkSuite {

  test("token budget: doc landing exactly on the budget stays, next drops") {
    import spark.implicits._
    // src a: 300 + 500 = 800 (== budget, kept) then 1 (cum 801, dropped)
    // src b: 900 alone already exceeds -> nothing survives
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 500L), ("a", 3L, 1L),
      ("b", 4L, 900L)).toDF("source", "doc_id", "n_tok")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = docs.withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= 800)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("epochs: ceil division, exact-fit source stays at 1, cap binds at 4") {
    import spark.implicits._
    // totals: a=2000 (exact fit -> 1 epoch), b=700 (ceil 20/7 = 3),
    // c=10 (ceil 200 -> capped at 4)
    val totals = Seq(("a", 2000L), ("b", 700L), ("c", 10L))
      .toDF("source", "tot_tok")
    val got = totals
      .withColumn("epochs",
        least(expr("(2000 + tot_tok - 1) div tot_tok"), lit(4L))
          .cast("long"))
      .select(col("source"), col("epochs"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 3L, "c" -> 4L))
  }

  test("epoch explode emits exactly epochs rows per doc, numbered from 1") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 3L), ("a", 2L, 3L), ("b", 3L, 1L))
      .toDF("source", "doc_id", "epochs")
    val out = docs
      .select(col("doc_id"), explode(sequence(lit(1L), col("epochs")))
        .as("epoch"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("lo"),
        max(col("epoch")).as("hi"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(1L -> ((3L, 1L, 3L)), 2L -> ((3L, 1L, 3L)),
      3L -> ((1L, 1L, 1L))))
  }
}
