package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pipeline observability: `observe()` metrics ride along a job
  * (batch: an Observation future; streaming: per-batch observedMetrics
  * in the progress events) — the production way to count rows/
  * violations WITHOUT a second scan of the input.
  */
class ObserveSpec extends SparkSuite {

  test("batch Observation counts rows and rule violations in one pass") {
    val obs = Observation("dq")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("n_chars") <= 0, 1).otherwise(0)).as("empty_docs"),
        sum(when(col("lang").isNull, 1).otherwise(0)).as("null_lang"))
    val kept = docs.filter(col("n_chars") > 40).count()
    val m = obs.get
    val direct = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(m("n_rows").asInstanceOf[Long] == direct)
    assert(m("empty_docs").asInstanceOf[Long] == 0L)
    assert(m("null_lang").asInstanceOf[Long] == 0L)
    assert(kept <= m("n_rows").asInstanceOf[Long])
  }

  test("streaming observe surfaces per-batch metrics in the progress log") {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val observed = raw.observe("batch_dq",
      count(lit(1)).as("n_rows"),
      sum(when(col("user_id").isNull, 1).otherwise(0)).as("null_users"))
    val q = observed.writeStream.format("noop")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("batch_dq")))
    assert(metrics.nonEmpty)
    val total = metrics.map(_.getAs[Long]("n_rows")).sum
    val batchInput = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(total == batchInput)
    assert(metrics.map(_.getAs[Long]("null_users")).sum == 0L)
  }
}
