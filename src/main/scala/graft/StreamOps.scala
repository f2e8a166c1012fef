package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import Tables._
import graft.sources.Unified2Fixture
import graft.streaming.Spool

/** Structured Streaming operators (SURVEY.md §2.D). Each `queries`
  * entry drives a real streaming query to completion with
  * Trigger.AvailableNow into a memory sink, so the driver's batch
  * harness can verify streaming semantics; the batch-equivalent oracle
  * SQL checks the result against DuckDB where expressible.
  *
  * Scale: these are the same plans you'd run unbounded — watermarked
  * window aggregation state, keyed dedup state and per-key session
  * state all live in the state store, partitioned by grouping key.
  */
object StreamOps {

  private val counter = new AtomicInteger(0)

  /** Run a bounded streaming DataFrame to completion, return result. */
  private def runOnce(s: SparkSession, df: DataFrame,
      mode: OutputMode): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val query = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    s.table(name)
  }

  /** events table as a stream (same nanos→µs convention as Tables.t). */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    // file stream sources take a directory; select the events table
    // out of the sf dir with a glob filter
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class SessEv(user_id: Long, event_id: Long, us: Long, value: Double)
  case class Sess(user_id: Long, sess_id: Long, n_events: Long,
      start_us: Long, end_us: Long, sess_value: Double)

  /** Emit 30-min-gap sessions for one user's buffered events. Exact
    * decimal accumulation keeps sess_value identical to the SQL
    * oracle's DECIMAL sum regardless of event order.
    */
  def sessionsOf(userId: Long, events: Iterator[SessEv]): Iterator[Sess] = {
    val sorted = events.toSeq.sortBy(e => (e.us, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Seq.newBuilder[Sess]
      var sessId = 0L
      var n = 0L
      var start = 0L; var end = 0L
      var value = BigDecimal(0)
      def flush(): Unit = if (n > 0)
        out += Sess(userId, sessId, n, start, end, value.toDouble)
      sorted.foreach { e =>
        if (n == 0 || e.us - end > 1800000000L) {
          flush()
          sessId += 1; n = 0; start = e.us; value = BigDecimal(0)
        }
        n += 1; end = e.us
        value += BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }
      flush()
      out.result().iterator
    }
  }

  val entries: Seq[Entry] = Seq(
    Entry(
      "stream_window_agg",
      // Tumbling 1-hour windows over the event stream; Complete mode +
      // AvailableNow drains the bounded source. Oracle: the equivalent
      // batch aggregation by date_trunc('hour').
      (s, dir) => {
        val agg = eventStream(s, dir)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("total_dec"))
        val res = runOnce(s, agg, OutputMode.Complete())
        res.select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n"),
            col("total_dec").cast("double").as("total"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    Entry(
      "stream_dedup",
      // Keyed streaming dedup: first occurrence per (user_id,
      // event_type) — batch-equivalent DISTINCT on the key set.
      (s, dir) => {
        val dd = eventStream(s, dir)
          .select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type")
        runOnce(s, dd, OutputMode.Append())
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    Entry(
      "stream_session",
      // Custom stateful operator: flatMapGroupsWithState session
      // windows (30-min gap), keyed by user. Oracled against the SAME
      // SQL as the batch sessionization (q27) — the streaming operator
      // must reproduce the declarative result exactly.
      (s, dir) => {
        import s.implicits._
        val evs: Dataset[SessEv] = eventStream(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
          .as[SessEv]
        val sessions = evs.groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.NoTimeout) {
            (uid: Long, it: Iterator[SessEv], state: GroupState[Int]) =>
              sessionsOf(uid, it)
          }
        runOnce(s, sessions.toDF(), OutputMode.Append())
          .orderBy(col("user_id"), col("sess_id"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        s AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        t AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
            ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id FROM s)
        SELECT user_id, sess_id, COUNT(*) AS n_events,
          MIN(us) AS start_us, MAX(us) AS end_us,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sess_value
        FROM t GROUP BY user_id, sess_id ORDER BY user_id, sess_id""")),

    Entry(
      "stream_stream_join",
      // Watermarked stream-stream interval join: purchases joined to
      // the same user's signups within the preceding hour. State on
      // both sides is bounded by the watermark + time-range condition;
      // the drained result equals the batch interval join (the oracle).
      (s, dir) => {
        val p = eventStream(s, dir)
          .filter(col("event_type") === "purchase")
          .withWatermark("ts", "1 hour")
          .select(col("event_id"), col("user_id"), col("ts"))
        val sg = eventStream(s, dir)
          .filter(col("event_type") === "signup")
          .withWatermark("ts", "1 hour")
          .select(col("event_id").as("s_event_id"),
            col("user_id").as("s_user_id"), col("ts").as("s_ts"))
        val joined = p.join(sg,
          col("user_id") === col("s_user_id") &&
            col("s_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
            col("s_ts") <= col("ts"))
        runOnce(s, joined, OutputMode.Append())
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"),
            col("s_event_id"), unix_micros(col("s_ts")).as("s_us"))
          .orderBy(col("event_id"), col("s_event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
        s.event_id AS s_event_id, epoch_us(s.ts) AS s_us
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        JOIN (SELECT * FROM events WHERE event_type='signup') s
        ON p.user_id = s.user_id
          AND s.ts >= p.ts - INTERVAL 1 HOUR AND s.ts <= p.ts
        ORDER BY p.event_id, s.event_id""")),

    Entry(
      "u2_stream",
      // Unified2 spool follow as a stream: AvailableNow drain of the
      // fixture spool through the streaming parser. SpoolStreamSpec
      // exercises the checkpoint-resume ("bookmark") behavior.
      (s, _) => {
        val spool = Unified2Fixture.writeSpool(
          s"${Unified2Fixture.defaultRoot()}/spool")
        val recs = Spool.streamRecords(s, Seq(spool), "snort.log", "sensor1")
        runOnce(s, recs.select(col("sensor"), col("src_file"),
            col("rec_index"), col("rec_type"), col("event_id"),
            col("signature_id")), OutputMode.Append())
          .orderBy(col("src_file"), col("rec_index"))
      },
      None)
  )
}
