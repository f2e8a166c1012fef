package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** Round-4 widening of the relational core (SURVEY.md §2.B): bitwise
  * aggregates, ordered string aggregation, calendar gap-fill via
  * `sequence`, GROUPS-style window frames (absent from Spark — composed
  * as aggregate-then-ROWS, proven against DuckDB's native GROUPS
  * frame), and linear-regression aggregates rebuilt from exact decimal
  * moments. All DuckDB-oracled.
  *
  * Scale notes: the gap-fill grid is dims × days — both tiny relative
  * to the fact table, so the grid side broadcasts and the only shuffle
  * is the fact aggregation itself. The GROUPS-frame composition
  * aggregates BEFORE windowing, so the window sees one row per peer
  * group (KBs) instead of the raw fact rows.
  */
object Analytics3 {

  /** Correctly-rounded double view of a WIDE exact decimal. A direct
    * int128-decimal→double cast can double-round (DuckDB's does:
    * `double(unscaled) / 10^scale`, an ulp off the true value at
    * sf0.01 — verified against exact rational arithmetic), so BOTH
    * sides route the cast through a decimal STRING, which parses to
    * the nearest double in one correctly-rounded step.
    */
  private def d38(c: org.apache.spark.sql.Column) =
    c.cast("string").cast("double")

  val entries: Seq[Entry] = Seq(
    Entry(
      "q52_bitwise_agg",
      // bit_and/bit_or/bit_xor integer aggregates (flag-mask roll-ups).
      // Integer-exact and commutative — safe under any partitioning.
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            bit_and(col("user_id")).as("band"),
            bit_or(col("user_id")).as("bor"),
            bit_xor(col("user_id")).as("bxor"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, BIT_AND(user_id) AS band,
        BIT_OR(user_id) AS bor, BIT_XOR(user_id) AS bxor, COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    Entry(
      "q53_listagg",
      // Ordered string aggregation (LISTAGG / string_agg): sort the
      // collected set so the result is deterministic under any
      // partitioning — collect_list order is not, array_sort makes it
      // so. Per-nation top-balance customer lists, kept bounded by a
      // selective filter.
      (s, dir) => {
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .filter(col("c_acctbal") > 9900)
          .groupBy(col("n_name"))
          .agg(
            concat_ws(",", array_sort(collect_list(col("c_name"))))
              .as("top_customers"),
            count(lit(1)).as("n_cust"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
        STRING_AGG(c_name, ',' ORDER BY c_name) AS top_customers,
        COUNT(*) AS n_cust
        FROM customer, nation
        WHERE c_nationkey = n_nationkey AND c_acctbal > 9900
        GROUP BY n_name ORDER BY n_name""")),

    Entry(
      "q54_gapfill",
      // Calendar gap-fill: zero-filled daily event counts per type over
      // the observed [min day, max day] span. The day spine comes from
      // `sequence(...)` + explode; the aggregated counts (type × day)
      // broadcast as the build side of the left join — the fact scan
      // shuffles once (the groupBy) and the tiny grid never does.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val bounds = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val days = bounds.select(
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
        val grid = t(s, dir, "events").select(col("event_type")).distinct()
          .crossJoin(days)
        val counts = ev.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
        // broadcast the BUILD side: a left-outer BroadcastHashJoin can
        // only build the right side, so a broadcast hint on the
        // streamed grid would be silently discarded and both sides
        // would shuffle. counts (types × days after aggregation) is
        // the tiny side anyway.
        grid.join(broadcast(counts), Seq("event_type", "day"), "left")
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            coalesce(col("cnt"), lit(0L)).as("n"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH ev AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
          FROM events),
        b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
        days AS (SELECT CAST(unnest(generate_series(
            CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        grid AS (SELECT et.event_type, days.day
          FROM (SELECT DISTINCT event_type FROM ev) et, days),
        counts AS (SELECT event_type, day, COUNT(*) AS cnt
          FROM ev GROUP BY 1, 2)
        SELECT g.event_type, strftime(g.day, '%Y-%m-%d') AS day,
          COALESCE(c.cnt, 0) AS n
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.day = c.day
        ORDER BY g.event_type, day""")),

    Entry(
      "q55_groups_frame",
      // GROUPS window frame (SQL:2011 `GROUPS BETWEEN 1 PRECEDING AND
      // CURRENT ROW`) — Spark has no GROUPS frames, but aggregating to
      // one row per peer group first makes ROWS ≡ GROUPS: the trailing
      // 2-peer-group revenue per event type. (DuckDB 1.x also hasn't
      // implemented GROUPS frames, so the oracle uses the same
      // composition; GroupsFrameSpec proves the GROUPS semantics on
      // planted SPARSE days — the previous PEER GROUP is summed, not
      // the previous calendar day.) Decimal sums, double at the edge
      // (Tables.scala determinism contract).
      (s, dir) => {
        val day = to_date(col("ts")).as("day")
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), day)
          .agg(sum(dec(col("value"))).as("day_rev"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-1, Window.currentRow)
        daily
          .withColumn("rev2d", sum(col("day_rev")).over(w).cast("double"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("rev2d"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (SELECT event_type,
          CAST(date_trunc('day', ts) AS DATE) AS day,
          SUM(CAST(value AS DECIMAL(12,2))) AS day_rev
        FROM events GROUP BY 1, 2)
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
          CAST(SUM(day_rev) OVER (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev2d
        FROM daily ORDER BY event_type, day""")),

    Entry(
      "q56_regr",
      // Linear-regression aggregates (regr_slope / regr_intercept /
      // regr_r2 shape): extendedprice ~ quantity per returnflag. Like
      // q24, every moment and every cross-product stays in EXACT
      // decimal arithmetic; doubles appear only in the final division —
      // slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) and intercept is
      // computed directly from moments ((Σy·Σxx − Σx·Σxy) / same
      // denominator) rather than from the slope, so no engine can fuse
      // a double multiply-subtract into an FMA and drift an ulp.
      // Explicit casts keep every decimal product within precision 38
      // in BOTH engines; the oracle declares its moments DECIMAL(19,_)
      // because DuckDB multiplies DECIMAL(18)s in raw int64 (observed
      // overflow at sf0.01) while ≥19 digits forces int128 — the
      // VALUES are identical either way, only the storage differs.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val qd = col("l_quantity").cast(DecimalType(4, 2))
        val pd = col("l_extendedprice").cast(DecimalType(8, 2))
        li.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast(DecimalType(12, 0)).as("n"),
            sum(qd).cast(DecimalType(18, 2)).as("sx"),
            sum(pd).cast(DecimalType(18, 2)).as("sy"),
            sum(qd * qd).cast(DecimalType(18, 4)).as("sxx"),
            sum(qd * pd).cast(DecimalType(18, 4)).as("sxy"))
          .select(
            col("l_returnflag"),
            col("n").cast("bigint").as("n"),
            (d38(col("n") * col("sxy") - col("sx") * col("sy")) /
              d38(col("n") * col("sxx") - col("sx") * col("sx")))
              .as("slope"),
            (d38(col("sy") * col("sxx") - col("sx") * col("sxy")) /
              d38(col("n") * col("sxx") - col("sx") * col("sx")))
              .as("intercept"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (SELECT l_returnflag,
          CAST(COUNT(*) AS DECIMAL(19,0)) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DECIMAL(19,2)) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS DECIMAL(19,2)) AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS DECIMAL(19,4)) AS sxx,
          CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_extendedprice AS DECIMAL(8,2))) AS DECIMAL(19,4)) AS sxy
        FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
          CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) /
            CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS slope,
          CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE) /
            CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS intercept
        FROM m ORDER BY l_returnflag""")),

    Entry(
      "q57_topk_agg",
      // Exact top-3 orders per priority via graft.functions.TopKAgg, a
      // TypedImperativeAggregate with a k-bounded buffer: map-side
      // partials shuffle ≤ tasks·groups·k rows instead of the whole
      // fact table the q07 window formulation would move. Values are
      // raw column passthrough (no arithmetic) and the (price DESC,
      // orderkey ASC) tiebreak is total, so the result hash-matches the
      // ranked-window oracle exactly.
      (s, dir) => {
        import org.apache.spark.sql.graft.DatasetBridge
        val topk = DatasetBridge.column(
          graft.functions.TopKAgg(
            DatasetBridge.expression(col("o_totalprice")),
            DatasetBridge.expression(col("o_orderkey")), 3)
            .toAggregateExpression())
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(topk.as("top"))
          .select(col("o_orderpriority"),
            posexplode(col("top")).as(Seq("pos", "e")))
          .select(col("o_orderpriority"),
            (col("pos") + 1).cast("bigint").as("rnk"),
            col("e.key").as("o_orderkey"),
            col("e.ord").as("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
        WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""")),

    Entry(
      "q58_salted_join",
      // Explicit skew-salted join: events carry only 5 distinct
      // event_type keys, so a plain shuffle join lands each hot key on
      // ONE reducer. Salting spreads it: big side gets
      // salt = pmod(hash(row id), S); the dim side replicates S ways;
      // the equi-join on (key, salt) fans each hot key over S
      // reducers. This is the manual form of AQE's skew-join split,
      // needed when AQE can't help (bucketed/bucket-sorted sides,
      // stateful stream joins) — here the dim is hinted shuffle_hash
      // so the demo actually exercises the salted shuffle rather than
      // broadcasting. Result provably identical to the direct join.
      (s, dir) => {
        val S = 8
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("value"),
            // hash() is null-safe (nulls hash to the seed), so every
            // row lands in a salt bucket
            pmod(hash(col("event_id")), lit(S)).as("salt"))
        val dim = t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("type_total"))
          .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
        ev.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("value"))).cast("double").as("total"),
            max(col("type_total")).as("type_total"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (SELECT event_type, COUNT(*) AS type_total
          FROM events GROUP BY event_type)
        SELECT e.event_type, COUNT(*) AS n,
          CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total,
          MAX(d.type_total) AS type_total
        FROM events e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type ORDER BY e.event_type""")),

    Entry(
      "q59_latest_per_key",
      // Latest record per key (the CDC/upsert compaction every
      // ingestion pipeline runs): row_number over (key ORDER BY ts
      // DESC, id) = 1. One shuffle on the key; WindowGroupLimit
      // prunes to the per-partition head before the sort at scale.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        WHERE rn = 1 ORDER BY user_id""")),

    Entry(
      "q60_frame_exclude",
      // SQL:2011 frame EXCLUDE CURRENT ROW (absent from Spark):
      // "peer average around each row" composed as frame-sum minus the
      // row's own value — exact decimal arithmetic, so subtraction
      // introduces no drift. The oracle runs DuckDB's NATIVE
      // EXCLUDE CURRENT ROW, proving the composition. Count variant
      // composes the same way (frame count − 1).
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("event_id")).rowsBetween(-5, 5)
        val vd = dec(col("value"))
        t(s, dir, "events")
          .withColumn("s", sum(vd).over(w) - vd)
          .withColumn("c", (count(lit(1)).over(w) - lit(1)).cast("bigint"))
          .select(col("event_type"), col("event_id"),
            col("s").cast("double").as("neighbor_sum"), col("c").as("neighbor_n"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_type, event_id,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
          PARTITION BY event_type ORDER BY event_id
          ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING
          EXCLUDE CURRENT ROW) AS DOUBLE) AS neighbor_sum,
        COUNT(*) OVER (PARTITION BY event_type ORDER BY event_id
          ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING
          EXCLUDE CURRENT ROW) AS neighbor_n
        FROM events ORDER BY event_type, event_id""")),

    Entry(
      "q61_unpivot",
      // UNPIVOT/melt: wide per-day metric columns back to long form
      // via Dataset.unpivot (codegen'd Expand, one pass, no shuffle
      // beyond the source agg). Oracle: portable UNION ALL form.
      (s, dir) => {
        val wide = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(
            sum(when(col("event_type") === "click", dec(col("value"))))
              .cast("double").as("click"),
            sum(when(col("event_type") === "view", dec(col("value"))))
              .cast("double").as("view"),
            sum(when(col("event_type") === "purchase", dec(col("value"))))
              .cast("double").as("purchase"))
        wide.unpivot(Array(col("day")),
            Array(col("click"), col("view"), col("purchase")),
            "metric", "total")
          .orderBy(col("day"), col("metric"))
      },
      Some("""WITH wide AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
          CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view,
          CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase
        FROM events GROUP BY 1)
        SELECT day, 'click' AS metric, click AS total FROM wide
        UNION ALL SELECT day, 'view', view FROM wide
        UNION ALL SELECT day, 'purchase', purchase FROM wide
        ORDER BY day, metric""")),

    Entry(
      "q63_session_window",
      // Spark's NATIVE session_window (dynamic-gap session aggregation
      // operator) vs the composable lag+cumsum form (q27): the oracle
      // re-derives sessions declaratively in DuckDB with the exact
      // native merge rule — events merge iff gap < 30 min STRICTLY
      // (session_window extends [ts, ts+gap) and merges on overlap;
      // the q27 formulation merges on <=). end_us is recovered as
      // window.end − gap = last event time, keeping the output purely
      // event-time (engine-independent).
      (s, dir) => {
        val gapUs = 1800000000L
        t(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes"),
            col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            dsum(col("value")).as("sess_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            (unix_micros(col("session_window.end")) - gapUs).as("end_us"),
            col("n_events"), col("sess_value"))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        s AS (SELECT *, CASE WHEN LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        t AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
            ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM s)
        SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sess_value
        FROM t GROUP BY user_id, sess_id ORDER BY user_id, start_us""")),

    Entry(
      "q64_cumulative_distinct",
      // Cumulative COUNT(DISTINCT) over an ordered window — supported
      // by NEITHER engine as a window aggregate. The scalable
      // decomposition: distinct-so-far at day d = users whose FIRST
      // day ≤ d, i.e. min-day per user → new-user counts per day →
      // running sum over the (tiny) day spine. No collect_set state
      // that grows with cardinality — the window input is one row per
      // day regardless of user count.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
        val perDay = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
        val days = ev.select(col("day")).distinct()
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        days.join(perDay, Seq("day"), "left")
          .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
          .withColumn("cum_users", sum(col("new_users")).over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("new_users"), col("cum_users"))
          .orderBy(col("day"))
      },
      Some("""WITH ev AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          user_id FROM events),
        fd AS (SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY 1),
        pd AS (SELECT first_day AS day, COUNT(*) AS new_users
          FROM fd GROUP BY 1),
        days AS (SELECT DISTINCT day FROM ev)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
          COALESCE(p.new_users, 0) AS new_users,
          CAST(SUM(COALESCE(p.new_users, 0)) OVER (ORDER BY d.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM days d LEFT JOIN pd p ON d.day = p.day ORDER BY day""")),

    Entry(
      "q65_frame_exclude_group",
      // Completes the SQL:2011 EXCLUDE family (q60 did CURRENT ROW):
      // EXCLUDE GROUP and EXCLUDE TIES composed from a RANGE frame
      // (yesterday+today per row) minus the peer-group sum (± own
      // value). With a RANGE frame the peer group is always wholly
      // inside the frame, so the subtraction is exact — that's why
      // this uses RANGE, not ROWS. Oracled against DuckDB's NATIVE
      // EXCLUDE GROUP / EXCLUDE TIES.
      (s, dir) => {
        val vd = dec(col("value"))
        val base = t(s, dir, "events")
          .withColumn("day_num", datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")))
        val wRange = Window.partitionBy(col("event_type"))
          .orderBy(col("day_num")).rangeBetween(-1, 0)
        val wPeers = Window.partitionBy(col("event_type"), col("day_num"))
        base
          .withColumn("range_sum", sum(vd).over(wRange))
          .withColumn("range_cnt", count(lit(1)).over(wRange))
          .withColumn("peer_sum", sum(vd).over(wPeers))
          .withColumn("peer_cnt", count(lit(1)).over(wPeers))
          .select(col("event_type"), col("event_id"),
            // SUM over an empty excluded frame is NULL, not 0 — guard
            // by count, not by sum equality (a zero-sum day would lie)
            when(col("range_cnt") > col("peer_cnt"),
              (col("range_sum") - col("peer_sum")).cast("double"))
              .as("excl_group"),
            (col("range_sum") - col("peer_sum") + vd).cast("double")
              .as("excl_ties"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_type, event_id,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
          PARTITION BY event_type
          ORDER BY date_diff('day', DATE '2024-01-01',
            CAST(date_trunc('day', ts) AS DATE))
          RANGE BETWEEN 1 PRECEDING AND CURRENT ROW
          EXCLUDE GROUP) AS DOUBLE) AS excl_group,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
          PARTITION BY event_type
          ORDER BY date_diff('day', DATE '2024-01-01',
            CAST(date_trunc('day', ts) AS DATE))
          RANGE BETWEEN 1 PRECEDING AND CURRENT ROW
          EXCLUDE TIES) AS DOUBLE) AS excl_ties
        FROM events ORDER BY event_type, event_id""")),

    Entry(
      "q66_grouping_id",
      // GROUPING()/grouping_id markers distinguish "aggregated-away"
      // from literal NULL in super-aggregate rows — the machine-
      // readable form of q21/q30/q36's '__ALL__' placeholders.
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"))
          .select(
            coalesce(col("l_returnflag"), lit("-")).as("rf"),
            coalesce(col("l_linestatus"), lit("-")).as("ls"),
            col("n"), col("g_rf"), col("g_ls"))
          .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls")),
      Some("""SELECT COALESCE(l_returnflag, '-') AS rf,
        COALESCE(l_linestatus, '-') AS ls, COUNT(*) AS n,
        CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, rf, ls""")),

    Entry(
      "q67_percentile_disc",
      // DISCRETE percentiles: the value at ceil(p·n) in sort order —
      // an actual data value, no interpolation, so unlike q23 the
      // result is integer-exact and hash-matches across engines even
      // for irrational-looking inputs. Composed with row_number (one
      // shuffle per group), the form that scales past
      // percentile()'s per-group memory.
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber"))
        val wn = Window.partitionBy(col("l_returnflag"))
        val ranked = t(s, dir, "lineitem")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
        // index = ceil(p·n) in pure integer math ((k·n+99) div 100 for
        // p = k/100) — float ceil(0.9·n) can double-round past the
        // true integer and shift the pick by one
        def pick(k: Int, name: String) =
          max(when(col("rn") ===
            expr(s"($k * n + 99) DIV 100"), col("l_extendedprice"))).as(name)
        ranked.groupBy(col("l_returnflag"))
          .agg(pick(25, "p25"), pick(50, "p50"), pick(90, "p90"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        quantile_disc(l_extendedprice, 0.25 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS p25,
        quantile_disc(l_extendedprice, 0.5 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS p50,
        quantile_disc(l_extendedprice, 0.9 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
