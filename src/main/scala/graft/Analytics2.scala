package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-2 widening of the relational core (SURVEY.md §2.B): grouping
  * sets, banded interval join, lead/lag, first/last/nth, ntile
  * bucketing, event-time range frames — each DuckDB-oracled.
  *
  * Scale notes as in [[Analytics]]; the interval join is the canonical
  * banded rewrite (equi-join on a time bin + exact range filter) so the
  * planner gets a shuffle hash join instead of a broadcast nested loop —
  * the difference between O(n+m) and O(n·m) at 100 TB.
  */
object Analytics2 {

  val entries: Seq[Entry] = Seq(
    Entry(
      "q36_grouping_sets",
      // GROUPING SETS {(rf,ls), (rf), ()} in one pass — the general
      // form of rollup/cube (q21/q30), Dataset.groupingSets API.
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("__ALL__")).as("rf"),
            coalesce(col("l_linestatus"), lit("__ALL__")).as("ls"),
            col("n"), col("qty"))
          .orderBy(col("rf"), col("ls")),
      Some("""SELECT COALESCE(l_returnflag, '__ALL__') AS rf,
        COALESCE(l_linestatus, '__ALL__') AS ls,
        COUNT(*) AS n, SUM(l_quantity) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          (l_returnflag), ())
        ORDER BY rf, ls""")),

    Entry(
      "q37_range_join",
      // Interval join via BANDING: views count in the 10 minutes before
      // each purchase. A raw θ-join on the range predicate plans as a
      // nested loop; bucketing both sides by a 10-min bin and exploding
      // the probe side to (bin-1, bin) turns it into an equi shuffle
      // join + cheap residual filter — each view lands in exactly one
      // bin so no dedup is needed. Scale: shuffle is O(n+m) on the bin
      // key; band width = range width keeps candidates tight.
      (s, dir) => {
        val B = 600000000L // 10 min in µs
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("us").as("p_us"),
            expr(s"us DIV $B").as("p_bin"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("v_id"), col("us").as("v_us"),
            expr(s"us DIV $B").as("v_bin"))
        val counts = p
          .withColumn("probe_bin",
            explode(array(col("p_bin") - 1, col("p_bin"))))
          .join(v, col("probe_bin") === col("v_bin"))
          .filter(col("v_us") >= col("p_us") - B &&
            col("v_us") <= col("p_us"))
          .groupBy(col("p_id")).agg(count(col("v_id")).as("n_views"))
        p.join(counts, Seq("p_id"), "left_outer")
          .select(col("p_id").as("event_id"),
            coalesce(col("n_views"), lit(0L)).as("n_views"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id,
        CAST(COUNT(v.event_id) AS BIGINT) AS n_views
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON epoch_us(v.ts) BETWEEN epoch_us(p.ts) - 600000000
             AND epoch_us(p.ts)
        GROUP BY p.event_id ORDER BY p.event_id""")),

    Entry(
      "q38_lead_lag",
      // lag/lead navigation: per-user gap to the previous event and the
      // type of the next one. One shuffle on user_id.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
          .withColumn("gap_prev_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select(col("user_id"), col("event_id"), col("gap_prev_us"),
            col("next_type"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_prev_us,
        LEAD(event_type, 1) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY user_id, event_id""")),

    Entry(
      "q39_first_last",
      // first_value / last_value / nth_value over an unbounded frame,
      // collapsed to one row per user.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("event_type"))
          .select(col("user_id"),
            first(col("event_type")).over(w).as("first_type"),
            last(col("event_type")).over(w).as("last_type"),
            nth_value(col("event_type"), 2).over(w).as("second_type"))
          .distinct()
          .orderBy(col("user_id"))
      },
      Some("""SELECT DISTINCT user_id,
        first_value(event_type) OVER w AS first_type,
        last_value(event_type) OVER w AS last_type,
        nth_value(event_type, 2) OVER w AS second_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id""")),

    Entry(
      "q40_ntile",
      // ntile quartiles of customers by balance WITHIN each nation
      // (partitioned ranking — no global sort bottleneck), then a
      // per-(nation, quartile) profile.
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("quartile", ntile(4).over(w))
          .groupBy(col("c_nationkey"), col("quartile"))
          .agg(count(lit(1)).as("n_cust"),
            dsum(col("c_acctbal")).as("bal"))
          .orderBy(col("c_nationkey"), col("quartile"))
      },
      Some("""WITH q AS (SELECT c_nationkey, c_acctbal,
          NTILE(4) OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey) AS quartile
        FROM customer)
        SELECT c_nationkey, quartile, COUNT(*) AS n_cust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        FROM q GROUP BY c_nationkey, quartile
        ORDER BY c_nationkey, quartile""")),

    Entry(
      "q41_range_frame",
      // Event-time RANGE frame: per-user trailing-1-hour spend at every
      // event (peers at the same instant share the frame). The frame is
      // on the µs long, so both engines bound it identically.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("trail_1h",
            sum(dec(col("value"))).over(w).cast("double"))
          .select(col("user_id"), col("event_id"), col("us"),
            col("trail_1h"))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS us,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
          (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS trail_1h
        FROM events ORDER BY user_id, us, event_id""")),

    Entry(
      "q45_cond_distinct",
      // conditional COUNT(DISTINCT CASE ...): distinct cardinalities
      // under different predicates in one grouped pass.
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(when(col("l_quantity") > 25, col("l_partkey")))
              .as("hi_qty_parts"),
            countDistinct(when(col("l_discount") >= 0.05, col("l_suppkey")))
              .as("disc_supps"),
            countDistinct(col("l_orderkey")).as("orders"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_partkey END) AS hi_qty_parts,
        COUNT(DISTINCT CASE WHEN l_discount >= 0.05 THEN l_suppkey END) AS disc_supps,
        COUNT(DISTINCT l_orderkey) AS orders
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Entry(
      "q46_percent_rank",
      // percent_rank / cume_dist relative-standing windows: exact
      // integer-ratio doubles, identical across engines.
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""SELECT c_nationkey, c_custkey,
        percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_nationkey, c_custkey""")),

    Entry(
      "q47_nullsafe_join",
      // NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
      // keys pair with NULL keys — the semantics dedup-on-nullable-key
      // pipelines depend on. NULLIF plants the NULLs identically on
      // both engines.
      (s, dir) => {
        val n1 = t(s, dir, "nation").select(
          col("n_nationkey").as("a_key"),
          nullif(col("n_regionkey"), lit(0)).as("a_r"))
        val n2 = t(s, dir, "nation").select(
          col("n_nationkey").as("b_key"),
          nullif(col("n_regionkey"), lit(0)).as("b_r"))
        n1.join(n2, col("a_r") <=> col("b_r"))
          .groupBy(col("a_key"))
          .agg(count(lit(1)).as("n_matches"))
          .orderBy(col("a_key"))
      },
      Some("""SELECT a.a_key, COUNT(*) AS n_matches
        FROM (SELECT n_nationkey AS a_key, NULLIF(n_regionkey, 0) AS a_r
              FROM nation) a
        JOIN (SELECT n_nationkey AS b_key, NULLIF(n_regionkey, 0) AS b_r
              FROM nation) b
          ON a.a_r IS NOT DISTINCT FROM b.b_r
        GROUP BY a.a_key ORDER BY a.a_key""")),

    Entry(
      "q48_ratio_to_report",
      // ratio-to-report: each order's share of its priority class —
      // exact decimal sums, one double division at the end.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            (dec(col("o_totalprice")).cast("double") /
              sum(dec(col("o_totalprice"))).over(w).cast("double"))
              .as("share"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) /
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS share
        FROM orders ORDER BY o_orderkey""")),

    Entry(
      "q49_multiset_ops",
      // INTERSECT ALL / EXCEPT ALL multiset semantics (duplicates
      // preserved by multiplicity) — distinct from q15's set forms.
      (s, dir) => {
        val hi = t(s, dir, "lineitem").filter(col("l_quantity") >= 25)
          .select(col("l_partkey"))
        val disc = t(s, dir, "lineitem").filter(col("l_discount") >= 0.05)
          .select(col("l_partkey"))
        hi.intersectAll(disc).groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_both"))
          .join(
            hi.exceptAll(disc).groupBy(col("l_partkey"))
              .agg(count(lit(1)).as("n_only_hi")),
            Seq("l_partkey"), "full_outer")
          .select(col("l_partkey"),
            coalesce(col("n_both"), lit(0L)).as("n_both"),
            coalesce(col("n_only_hi"), lit(0L)).as("n_only_hi"))
          .orderBy(col("l_partkey"))
      },
      Some("""WITH hi AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 25),
        d AS (SELECT l_partkey FROM lineitem WHERE l_discount >= 0.05),
        inboth AS (SELECT l_partkey, COUNT(*) AS n_both
          FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM d)
          GROUP BY l_partkey),
        onlyhi AS (SELECT l_partkey, COUNT(*) AS n_only_hi
          FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM d)
          GROUP BY l_partkey)
        SELECT COALESCE(inboth.l_partkey, onlyhi.l_partkey) AS l_partkey,
          COALESCE(n_both, 0) AS n_both,
          COALESCE(n_only_hi, 0) AS n_only_hi
        FROM inboth FULL OUTER JOIN onlyhi USING (l_partkey)
        ORDER BY l_partkey""")),

    Entry(
      "q50_histogram",
      // fixed-width histogram of event values per type: integer floor
      // bucketing, the profile pass every ingestion QA run needs.
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("bucket",
            floor(dec(col("value")) / 10).cast("long"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bucket")),
      Some("""SELECT event_type,
        CAST(FLOOR(CAST(value AS DECIMAL(12,2)) / 10) AS BIGINT) AS bucket,
        COUNT(*) AS n
        FROM events GROUP BY event_type, bucket
        ORDER BY event_type, bucket""")),

    Entry(
      "q51_asof_forward",
      // FORWARD as-of via the custom operator on the negated time axis
      // (AsOf.joinForward): each signup pairs with the user's FIRST
      // purchase at-or-after it. Oracled against DuckDB's forward ASOF.
      (s, dir) => {
        val ev = t(s, dir, "events")
        val sg = ev.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("s_us"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"),
            col("event_id").as("p_event_id"),
            unix_micros(col("ts").cast("timestamp")).as("p_us"))
        graft.plans.AsOf.joinForward(sg, p, Seq("user_id"), "s_us",
            Seq("p_user_id"), "p_us")
          .select(col("event_id"), col("user_id"), col("s_us"),
            col("p_event_id"), col("p_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT s.event_id, s.user_id, epoch_us(s.ts) AS s_us,
        p.event_id AS p_event_id, epoch_us(p.ts) AS p_us
        FROM (SELECT * FROM events WHERE event_type='signup') s
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
        ON s.user_id = p.user_id AND s.ts <= p.ts
        ORDER BY s.event_id"""))
  )
}
