package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Recursive / iterative graph queries (SURVEY.md §2.B tail): the
  * hierarchy family the reference exposes through its recursive query
  * layer (reference: charlotte query engine's hierarchical alert
  * grouping), re-expressed as driver-side fixpoint loops over Spark
  * joins — the standard Spark answer to `WITH RECURSIVE`.
  *
  * The part table carries a deterministic synthetic forest: parent(p) =
  * p div 10 (when >= 1), i.e. part 1234 → 123 → 12 → 1. Both engines
  * derive the identical edge list from the raw table, so every entry
  * here is DuckDB-oracled against a real `WITH RECURSIVE`.
  *
  * Scale story: depth of this hierarchy is log₁₀(N) — at 100 TB (~1e9
  * parts) that is 9 joins, each shuffling a frontier that SHRINKS 10×
  * per level. Each iteration is `localCheckpoint`ed so the physical
  * plan stays one join deep instead of re-executing the whole prefix
  * (the classic iterative-Spark trap), and the static edge relation is
  * persisted once and re-probed. BFS additionally anti-joins the
  * visited set so a node is expanded exactly once regardless of how
  * many walks reach it — the frontier is bounded by the ball size, not
  * by the walk count the oracle enumerates.
  */
object Analytics5 {

  /** Parent edges of the synthetic part hierarchy (child, parent),
    * both BIGINT. Root nodes (0..9) have no parent row.
    */
  private def edges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey").cast("long").as("child"),
        expr("p_partkey div 10").cast("long").as("parent"))
      .filter(col("parent") >= 1)

  private val oracleEdges =
    """edges AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS child,
      |         CAST(p_partkey // 10 AS BIGINT) AS parent
      |  FROM part WHERE p_partkey // 10 >= 1)""".stripMargin

  /** Transitive closure (part, anc, lvl): every ancestor of every part,
    * with lvl = #edges on the chain. Fixpoint loop: the level-k frontier
    * joined to the edge list yields level k+1; terminates because
    * parent < child strictly (a DAG by construction). Each level is
    * materialized exactly once (localCheckpoint) and every level is
    * kept — the closure IS their union; blocks free with the session
    * (or the ContextCleaner once the result's references drop).
    */
  private def closure(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir).persist()
    // LAZY checkpoint + explicit count() per level (r20): the count
    // materializes the full checkpoint AND answers the fixpoint probe
    // in ONE job, where the eager checkpoint paid a materialization
    // job plus an isEmpty job per level (guide §1.2 — fewer passes).
    var frontier = e
      .select(col("child").as("part"), col("parent").as("anc"),
        lit(1).as("lvl"))
      .localCheckpoint(false)
    var frontierRows = frontier.count()
    var levels = List(frontier)
    var iter = 0
    while (frontierRows > 0) {
      iter += 1
      // log-depth guarantee: parent has one decimal digit fewer
      if (iter > 20) sys.error(s"closure: no fixpoint after $iter levels")
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.anc") === col("e.child"))
        .select(col("f.part"), col("e.parent").as("anc"),
          (col("f.lvl") + 1).as("lvl"))
        .localCheckpoint(false)
      frontierRows = next.count()
      frontier = next
      if (frontierRows > 0) levels ::= next
    }
    val out = levels.reduce(_ union _)
    e.unpersist()
    out
  }

  val entries: Seq[Entry] = Seq(
    Entry(
      "q82_bom_closure",
      // BOM explosion: per part, its depth in the hierarchy, ancestor
      // count, and root (the MIN ancestor — chains strictly decrease).
      // Roots (no ancestors) surface themselves with depth 0 via the
      // left join back to the full part list.
      (s, dir) => {
        val cl = closure(s, dir)
        val agg = cl.groupBy(col("part"))
          .agg(max(col("lvl")).cast("long").as("depth"),
            count(lit(1)).as("n_anc"), min(col("anc")).as("root"))
        t(s, dir, "part")
          .select(col("p_partkey").cast("long").as("part"))
          .join(agg, Seq("part"), "left")
          .select(col("part"),
            coalesce(col("depth"), lit(0L)).as("depth"),
            coalesce(col("n_anc"), lit(0L)).as("n_anc"),
            coalesce(col("root"), col("part")).as("root"))
          .orderBy(col("part"))
      },
      Some(s"""WITH RECURSIVE $oracleEdges,
        closure(part, anc, lvl) AS (
          SELECT child, parent, 1 FROM edges
          UNION ALL
          SELECT c.part, e.parent, c.lvl + 1
          FROM closure c JOIN edges e ON c.anc = e.child),
        agg AS (SELECT part, MAX(lvl) AS depth, COUNT(*) AS n_anc,
                  MIN(anc) AS root
                FROM closure GROUP BY part)
        SELECT CAST(p.p_partkey AS BIGINT) AS part,
               CAST(COALESCE(a.depth, 0) AS BIGINT) AS depth,
               COALESCE(a.n_anc, 0) AS n_anc,
               COALESCE(a.root, CAST(p.p_partkey AS BIGINT)) AS root
        FROM part p
        LEFT JOIN agg a ON CAST(p.p_partkey AS BIGINT) = a.part
        ORDER BY part""")),

    Entry(
      "q83_bom_rollup",
      // Subtree cost rollup: each part's retail price plus the price of
      // every descendant (the closure read anc-side), exact-decimal
      // summed per the Tables determinism contract. One shuffle on anc
      // after the closure; the price relation joins the closure on its
      // already-shuffled part key.
      (s, dir) => {
        val price = t(s, dir, "part")
          .select(col("p_partkey").cast("long").as("part"),
            dec(col("p_retailprice")).as("price"))
        val rolled = closure(s, dir)
          .join(price, "part")
          .groupBy(col("anc"))
          .agg(count(lit(1)).as("n_desc"), sum(col("price")).as("dp"))
        price.join(rolled, price("part") === rolled("anc"), "left")
          .select(price("part"), coalesce(col("n_desc"), lit(0L)).as("n_desc"),
            (price("price") + coalesce(col("dp"), lit(0)))
              .cast("double").as("subtree_price"))
          .orderBy(col("part"))
      },
      Some(s"""WITH RECURSIVE $oracleEdges,
        closure(part, anc) AS (
          SELECT child, parent FROM edges
          UNION ALL
          SELECT c.part, e.parent
          FROM closure c JOIN edges e ON c.anc = e.child),
        rolled AS (
          SELECT cl.anc, COUNT(*) AS n_desc,
                 SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS dp
          FROM closure cl
          JOIN part p ON CAST(p.p_partkey AS BIGINT) = cl.part
          GROUP BY cl.anc)
        SELECT CAST(p.p_partkey AS BIGINT) AS part,
               COALESCE(r.n_desc, 0) AS n_desc,
               CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                    + COALESCE(r.dp, 0) AS DOUBLE) AS subtree_price
        FROM part p
        LEFT JOIN rolled r ON CAST(p.p_partkey AS BIGINT) = r.anc
        ORDER BY part""")),

    Entry(
      "q84_bfs_hops",
      // Shortest hop count from part 1 over the UNDIRECTED hierarchy,
      // capped at 4 hops: frontier BFS with an anti-join against the
      // visited set, so each node is expanded once (the oracle instead
      // enumerates all ≤4-step walks and takes MIN — equivalent by
      // BFS optimality, but only the Spark plan survives a dense graph).
      (s, dir) => {
        val e = edges(s, dir)
        val und = e.select(col("child").as("a"), col("parent").as("b"))
          .union(e.select(col("parent").as("a"), col("child").as("b")))
          .persist()
        // lazy checkpoint + count() fixpoint probe — one job per hop
        // instead of eager-materialize + isEmpty (r20, same treatment
        // as the BOM closure)
        var levels = List(s.range(1)
          .select(lit(1L).as("node"), lit(0).as("d"))
          .localCheckpoint(false))
        var frontier = levels.head
        var frontierRows = frontier.count()
        var hop = 0
        while (hop < 4 && frontierRows > 0) {
          hop += 1
          // the visited set is the union of already-materialized level
          // scans — nothing is re-checkpointed as it grows
          val visited = levels.reduce(_ union _)
          val next = frontier.alias("f")
            .join(und.alias("u"), col("f.node") === col("u.a"))
            .select(col("u.b").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("d", lit(hop))
            .localCheckpoint(false)
          frontierRows = next.count()
          if (frontierRows > 0) levels ::= next
          frontier = next
        }
        und.unpersist()
        levels.reduce(_ union _)
          .select(col("node"), col("d").cast("long").as("dist"))
          .orderBy(col("node"))
      },
      Some(s"""WITH RECURSIVE $oracleEdges,
        und AS (SELECT child AS a, parent AS b FROM edges
                UNION ALL SELECT parent, child FROM edges),
        walk(node, d) AS (
          SELECT CAST(1 AS BIGINT), 0
          UNION ALL
          SELECT u.b, w.d + 1 FROM walk w
          JOIN und u ON u.a = w.node WHERE w.d < 4)
        SELECT node, CAST(MIN(d) AS BIGINT) AS dist
        FROM walk GROUP BY node ORDER BY node""")),

    Entry(
      "q85_rolling_median",
      // Rolling EXACT median of the last 7 events per user. Restricted
      // to full 7-row frames so the median is always the one middle
      // element of an odd window — pure selection, no interpolation
      // arithmetic to diverge between engines. One shuffle on user_id;
      // per-row state is the 7-row frame, O(1) per partition.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val frame = ord.rowsBetween(-6, 0)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          // NULL values would desync from the oracle (collect_list
          // drops them, MEDIAN ignores them but interpolates the even
          // remainder) — exclude them identically on both engines
          .filter(col("value").isNotNull)
          .withColumn("rn", row_number().over(ord))
          // Spark disallows frames on median(); the exact middle of the
          // 7-row frame via sorted collect_list is the same selection
          .withColumn("med", element_at(
            array_sort(collect_list(col("value")).over(frame)), 4))
          .filter(col("rn") >= 7)
          .select(col("user_id"), col("event_id"), col("med"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, med FROM (
          SELECT user_id, event_id,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS rn,
            MEDIAN(value) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med
          FROM events WHERE value IS NOT NULL)
        WHERE rn >= 7 ORDER BY user_id, event_id""")),

    Entry(
      "q86_scd2_join",
      // SCD2 point-in-time dimension join, the classic warehouse
      // pattern, composed from the custom as-of operator: a 3-version
      // slowly-changing customer dimension (versions derived
      // deterministically so both engines build the identical dim),
      // each order joined to the version in effect at order time —
      // greatest valid_from <= o_date per customer, i.e. exactly
      // AsOf.join (one shuffle per side + merge; orders before their
      // customer's first version keep NULL attributes). Rolled up per
      // credit tier. Scale: dim is |customer|×3 — same key
      // distribution as the fact join key, no broadcast assumption.
      (s, dir) => {
        val dayUs = 86400000000L
        val baseUs = 694224000000000L // 1992-01-01T00:00:00Z, µs
        val dim = t(s, dir, "customer")
          .select(col("c_custkey"))
          .withColumn("k", explode(array(lit(0L), lit(1L), lit(2L))))
          .select(col("c_custkey").as("d_custkey"),
            (lit(baseUs) + (col("k") * 800 + col("c_custkey") % 90)
              * dayUs).as("valid_from_us"),
            ((col("c_custkey") * 7 + col("k") * 3) % 5).as("credit_tier"))
        val f = t(s, dir, "orders")
          .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
            col("o_totalprice"))
        graft.plans.AsOf.join(f, dim, Seq("o_custkey"), "o_us",
            Seq("d_custkey"), "valid_from_us")
          .groupBy(col("credit_tier"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"))
          .orderBy(col("credit_tier").asc_nulls_first)
      },
      Some("""WITH dim AS (
          SELECT c_custkey AS d_custkey,
            epoch_us(TIMESTAMP '1992-01-01')
              + (k*800 + c_custkey%90) * 86400000000 AS valid_from_us,
            (c_custkey*7 + k*3) % 5 AS credit_tier
          FROM customer, (SELECT unnest([0,1,2]) AS k)),
        f AS (SELECT o_custkey, epoch_us(o_orderdate) AS o_us,
            o_totalprice FROM orders)
        SELECT d.credit_tier, COUNT(*) AS n_orders,
          CAST(SUM(CAST(f.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
            AS total_price
        FROM f ASOF LEFT JOIN dim d
          ON f.o_custkey = d.d_custkey AND f.o_us >= d.valid_from_us
        GROUP BY d.credit_tier
        ORDER BY d.credit_tier NULLS FIRST""")),

    Entry(
      "q88_lateral",
      // LATERAL correlated subquery with per-row ORDER BY + LIMIT (the
      // top-N-per-key idiom in its SQL-standard form), through the
      // spark.sql surface — Catalyst decorrelates it into the same
      // ranked-window plan q59 writes by hand, so the SQL sugar costs
      // nothing at scale. Inner lateral join: order-less customers drop
      // on both engines.
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("graft_cust")
        t(s, dir, "orders").createOrReplaceTempView("graft_ord")
        s.sql("""
          SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM graft_cust c,
          LATERAL (SELECT o_orderkey, o_totalprice
                   FROM graft_ord o WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders o WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")),

    Entry(
      "q87_pagerank",
      // PageRank (damping 0.85, 3 fixed iterations, init 1.0) over the
      // undirected part hierarchy — the numeric-fixpoint loop rounding
      // out the iterative family (closure = set growth, CC = label
      // min, BFS = frontier, this = mass flow). Per iteration: one
      // join rank⋈edges + one shuffle on the destination key — the
      // textbook distributed PR step; per-level localCheckpoint keeps
      // the plan one iteration deep. Hub skew at scale is the usual
      // AQE-skew/salting case.
      //
      // Rank mass is FIXED-POINT: scaled longs in 1e-12 units (init
      // 1e12 = rank 1.0; 0.15 → 1.5e11; per-edge contribution =
      // rank div deg; damping = (85·Σc) div 100). Integer sums are
      // order-independent, so the per-dst aggregation is exactly
      // reproducible AND exactly expressible as DuckDB BIGINT sums —
      // this was the only rows-only entry that wasn't an approximation
      // by construction (VERDICT r7 #1). Truncation bias: each div
      // loses <1 unit (1e-12 rank), total drift ~1e-7 over 3
      // iterations — far inside GraphSpec's 1e-6 mass-conservation
      // band. Long headroom: 85·Σc overflows only past ~1e5 rank
      // units landing on ONE node (mass here concentrates ~10× per
      // hub, nowhere near it); Spark 4 ANSI mode makes any overflow
      // throw rather than wrap, and DuckDB computes the same stages
      // in HUGEINT. The final rank is the single IEEE division
      // units/1e12 on both engines → bit-identical doubles.
      (s, dir) => {
        val e = edges(s, dir)
        val und = e.select(col("child").as("a"), col("parent").as("b"))
          .union(e.select(col("parent").as("a"), col("child").as("b")))
        val deg = und.groupBy(col("a"))
          .agg(count(lit(1)).as("deg"))
        val und2 = und.join(deg, "a").persist()
        // lazy checkpoints (r20): each round's plan is still truncated
        // to a LogicalRDD, but the per-round result-stage job folds
        // into the next round's shuffle (3 fixed rounds — no probe
        // needed); the caller's action runs the last stage
        var r = deg.select(col("a").as("node"),
            lit(1000000000000L).as("rank"))
          .localCheckpoint(false)
        for (i <- 1 to 3) {
          r = und2.join(r, und2("a") === r("node"))
            .select(col("b"), expr("rank div deg").as("c"))
            .groupBy(col("b"))
            .agg((lit(150000000000L) +
              expr("(85 * sum(c)) div 100")).as("rank"))
            .select(col("b").as("node"), col("rank"))
            // the LAST round checkpoints EAGERLY so all three rounds
            // materialize while und2 is still persisted (ADVICE r20:
            // the all-lazy chain deferred every round past the
            // unpersist below, so the persist never served its three
            // consumers and und2 recomputed per round at action time);
            // earlier rounds stay lazy (r20: fold result stage into
            // the next round's shuffle)
            .localCheckpoint(i == 3)
        }
        und2.unpersist()
        r.select(col("node"),
            (col("rank").cast("double") / lit(1e12)).as("rank"))
          .orderBy(col("node"))
      },
      Some(s"""WITH $oracleEdges,
        und AS (
          SELECT child AS a, parent AS b FROM edges
          UNION ALL
          SELECT parent AS a, child AS b FROM edges),
        deg AS (SELECT a, COUNT(*) AS deg FROM und GROUP BY a),
        ud AS (SELECT und.a, und.b, deg.deg FROM und JOIN deg USING (a)),
        r0 AS (SELECT a AS node, CAST(1000000000000 AS BIGINT) AS rank
               FROM deg),
        r1 AS (SELECT u.b AS node,
                 CAST(150000000000 + (85 * SUM(r.rank // u.deg)) // 100
                   AS BIGINT) AS rank
               FROM ud u JOIN r0 r ON r.node = u.a GROUP BY u.b),
        r2 AS (SELECT u.b AS node,
                 CAST(150000000000 + (85 * SUM(r.rank // u.deg)) // 100
                   AS BIGINT) AS rank
               FROM ud u JOIN r1 r ON r.node = u.a GROUP BY u.b),
        r3 AS (SELECT u.b AS node,
                 CAST(150000000000 + (85 * SUM(r.rank // u.deg)) // 100
                   AS BIGINT) AS rank
               FROM ud u JOIN r2 r ON r.node = u.a GROUP BY u.b)
        SELECT node, CAST(rank AS DOUBLE) / 1e12 AS rank
        FROM r3 ORDER BY node""")),

    Entry(
      "dq_report",
      // Rule-based data-quality audit — the pre-ingest gate an
      // analytics engine runs before trusting a drop: per-table rule
      // violations in ONE pass per table (conditional sums), FK orphan
      // checks as anti-joins (shuffle joins — neither side assumed
      // broadcastable), assembled into a (rule, n_violations,
      // n_checked) report via 1×1-row cross joins.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val liAgg = li.agg(
          count(lit(1)).as("n_li"),
          sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("bad_qty"),
          sum(when(!(col("l_discount") >= 0 && col("l_discount") <= 0.1), 1)
            .otherwise(0)).as("bad_disc"),
          sum(when(col("l_shipdate") >
            lit("1999-01-01").cast("timestamp_ntz"), 1)
            .otherwise(0)).as("bad_ship"))
        val liOrph = li.join(ord,
            li("l_orderkey") === ord("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("li_orph"))
        val ordAgg = ord.agg(count(lit(1)).as("n_ord"),
          sum(when(col("o_custkey").isNull, 1).otherwise(0)).as("null_ck"))
        val ordOrph = ord.join(cust,
            ord("o_custkey") === cust("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("ord_orph"))
        liAgg.crossJoin(liOrph).crossJoin(ordAgg).crossJoin(ordOrph)
          .select(explode(array(
            struct(lit("lineitem_discount_range").as("rule"),
              col("bad_disc").cast("long").as("n_violations"),
              col("n_li").as("n_checked")),
            struct(lit("lineitem_future_shipdate").as("rule"),
              col("bad_ship").cast("long").as("n_violations"),
              col("n_li").as("n_checked")),
            struct(lit("lineitem_nonpositive_qty").as("rule"),
              col("bad_qty").cast("long").as("n_violations"),
              col("n_li").as("n_checked")),
            struct(lit("lineitem_orphan_orderkey").as("rule"),
              col("li_orph").as("n_violations"), col("n_li").as("n_checked")),
            struct(lit("orders_null_custkey").as("rule"),
              col("null_ck").cast("long").as("n_violations"),
              col("n_ord").as("n_checked")),
            struct(lit("orders_orphan_custkey").as("rule"),
              col("ord_orph").as("n_violations"),
              col("n_ord").as("n_checked")))).as("r"))
          .select(col("r.rule").as("rule"),
            col("r.n_violations").as("n_violations"),
            col("r.n_checked").as("n_checked"))
          .orderBy(col("rule"))
      },
      Some("""WITH li AS (SELECT COUNT(*) n,
            SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) bad_qty,
            SUM(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.1)
              THEN 1 ELSE 0 END) bad_disc,
            SUM(CASE WHEN l_shipdate > TIMESTAMP '1999-01-01'
              THEN 1 ELSE 0 END) bad_ship
          FROM lineitem),
        lo AS (SELECT COUNT(*) c FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        o AS (SELECT COUNT(*) n, SUM(CASE WHEN o_custkey IS NULL
            THEN 1 ELSE 0 END) nullck FROM orders),
        oo AS (SELECT COUNT(*) c FROM orders od WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = od.o_custkey))
        SELECT * FROM (
          SELECT 'lineitem_discount_range' AS rule,
            CAST(li.bad_disc AS BIGINT) AS n_violations,
            li.n AS n_checked FROM li
          UNION ALL SELECT 'lineitem_future_shipdate',
            CAST(li.bad_ship AS BIGINT), li.n FROM li
          UNION ALL SELECT 'lineitem_nonpositive_qty',
            CAST(li.bad_qty AS BIGINT), li.n FROM li
          UNION ALL SELECT 'lineitem_orphan_orderkey', lo.c, li.n
            FROM lo, li
          UNION ALL SELECT 'orders_null_custkey',
            CAST(o.nullck AS BIGINT), o.n FROM o
          UNION ALL SELECT 'orders_orphan_custkey', oo.c, o.n
            FROM oo, o)
        ORDER BY rule""")),

    Entry(
      "q89_variant",
      // Spark 4 VariantType end-to-end: JSON built from lineitem rows
      // → parse_json → typed variant_get path extraction → relational
      // aggregate. Variant is the open-schema semi-structured column
      // (binary-encoded, path access without full shred) — the modern
      // replacement for stringly-typed JSON columns at scale. Sum
      // stays order-independent (quantities are integer-valued
      // doubles, exact in binary64). Oracle: DuckDB json_extract over
      // identically constructed JSON.
      (s, dir) => {
        val js = concat(
          lit("{\"ok\":"), col("l_orderkey").cast("string"),
          lit(",\"line\":"), col("l_linenumber").cast("string"),
          lit(",\"dims\":{\"qty\":"), col("l_quantity").cast("string"),
          lit(",\"flag\":\""), col("l_returnflag"), lit("\"}}"))
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 100 === 0)
          .select(parse_json(js).as("v"))
          .select(
            variant_get(col("v"), "$.dims.qty", "double").as("qty"),
            variant_get(col("v"), "$.dims.flag", "string").as("flag"),
            variant_get(col("v"), "$.line", "bigint").as("line"))
          .groupBy(col("flag"))
          .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
            max(col("line")).as("max_line"))
          .orderBy(col("flag"))
      },
      Some("""WITH j AS (SELECT
            '{"ok":' || l_orderkey || ',"line":' || l_linenumber ||
            ',"dims":{"qty":' || l_quantity || ',"flag":"' ||
            l_returnflag || '"}}' AS js
          FROM lineitem WHERE l_orderkey % 100 = 0),
        e AS (SELECT
            CAST(json_extract_string(js, '$.dims.qty') AS DOUBLE) AS qty,
            json_extract_string(js, '$.dims.flag') AS flag,
            CAST(json_extract_string(js, '$.line') AS BIGINT) AS line
          FROM j)
        SELECT flag, COUNT(*) AS n, SUM(qty) AS sum_qty,
          MAX(line) AS max_line
        FROM e GROUP BY flag ORDER BY flag""")),

    Entry(
      "dq_freshness",
      // Ingest-freshness report — the staleness monitor a streaming
      // warehouse publishes per feed: for each event_type, event
      // count, newest event, lag behind the corpus watermark (global
      // max ts), and how much of the feed arrived in the final hour
      // before it. Pure integer-µs arithmetic (no timezone, no
      // rounding) over ONE map-side-combined groupBy + a broadcast
      // 1-row global max — bounded output at any scale.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
        val mx = ev.agg(max(col("us")).as("wm_us"))
        ev.crossJoin(broadcast(mx))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            max(col("us")).as("max_us"),
            first(col("wm_us")).as("wm_us"),
            sum(when(col("us") >= col("wm_us") - 3600000000L, 1L)
              .otherwise(0L)).as("n_last_hour"))
          .select(col("event_type"), col("n_events"), col("max_us"),
            (col("wm_us") - col("max_us")).as("lag_us"),
            col("n_last_hour"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS us
          FROM events),
        mx AS (SELECT MAX(us) AS wm_us FROM e)
        SELECT event_type, COUNT(*) AS n_events, MAX(us) AS max_us,
          mx.wm_us - MAX(us) AS lag_us,
          CAST(SUM(CASE WHEN us >= mx.wm_us - 3600000000 THEN 1
            ELSE 0 END) AS BIGINT) AS n_last_hour
        FROM e, mx GROUP BY event_type, mx.wm_us
        ORDER BY event_type""")),

    Entry(
      "q90_twap",
      // Time-weighted average (the TWAP/IoT-telemetry aggregate —
      // a plain AVG over irregular samples over-weights bursts; each
      // value must count for HOW LONG it held): per user, Σ v·Δt / ΣΔt
      // over consecutive-event intervals. Exactness: value is 2-dp
      // money (vq = round(100·v) BIGINT), Δt is integer µs, so each
      // term is an exact BIGINT product and the per-user sums are
      // order-free (DECIMAL(38,0) accumulation — a 100 TB user's
      // term-sum outgrows int64); ONE final IEEE division each side.
      // Shape: one lead() window + one user_id agg — single shuffle.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("vq", round(col("value") * 100).cast("long"))
          .withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .withColumn("dus", col("next_us") - col("us"))
          .withColumn("term", col("vq") * col("dus"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dus")).as("total_us"),
            sum(col("term").cast("decimal(38,0)")).as("tsum"))
          .withColumn("twap", col("tsum").cast("double") / 100.0 /
            col("total_us").cast("double"))
          .select(col("user_id"), col("n_intervals"), col("total_us"),
            col("twap"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(round(value * 100) AS BIGINT) AS vq
          FROM events),
        iv AS (SELECT user_id, us, vq,
            lead(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS next_us
          FROM e),
        t AS (SELECT user_id, next_us - us AS dus,
            vq * (next_us - us) AS term
          FROM iv WHERE next_us IS NOT NULL)
        SELECT user_id, COUNT(*) AS n_intervals,
          CAST(SUM(dus) AS BIGINT) AS total_us,
          CAST(SUM(term) AS DOUBLE) / 100.0 / CAST(SUM(dus) AS DOUBLE)
            AS twap
        FROM t GROUP BY user_id ORDER BY user_id""")),

    Entry(
      "q91_decay_sum",
      // Recency-weighted engagement score (the half-life decay every
      // ranking/feature pipeline wants: yesterday's click counts half
      // of today's): Σ v·2^(−age_days) per user against the corpus
      // max timestamp. EXACT arithmetic with a transcendental-free
      // decay — the power-of-two half-life makes the weight an
      // arithmetic right-shift of the 2-dp integer value (vq >> d,
      // identical truncating semantics both engines, capped at 62) so
      // the per-user sum is an order-free BIGINT; one IEEE division
      // at the end. Shape: one broadcast 1-row max + one user agg.
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("value"))
          .withColumn("vq", round(col("value") * 100).cast("long"))
        val mx = ev.agg(max(col("us")).as("max_us"))
        ev.crossJoin(broadcast(mx))
          .withColumn("d",
            least(expr("(max_us - us) DIV 86400000000"), lit(62L)))
          .withColumn("termq", expr("shiftright(vq, cast(d as int))"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("termq")).as("score_q"))
          .withColumn("score", col("score_q").cast("double") / 100.0)
          .select(col("user_id"), col("n_events"), col("score_q"),
            col("score"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us,
            CAST(round(value * 100) AS BIGINT) AS vq
          FROM events),
        mx AS (SELECT MAX(us) AS max_us FROM e),
        t AS (SELECT user_id,
            vq >> CAST(LEAST((mx.max_us - us) // 86400000000, 62)
              AS INT) AS termq
          FROM e, mx)
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(termq) AS BIGINT) AS score_q,
          CAST(CAST(SUM(termq) AS BIGINT) AS DOUBLE) / 100.0 AS score
        FROM t GROUP BY user_id ORDER BY user_id""")),

    Entry(
      "table_profile",
      // Column profiling (the ANALYZE surface): one aggregation pass
      // emits per-column null count, exact distinct count and min/max,
      // pivoted to a row per column. Values render through stable
      // cross-engine formats (integers, DECIMAL(12,2) for money,
      // formatted timestamps) so the report hash-matches the oracle.
      // Multi-countDistinct expands the scan 5× pre-shuffle — the
      // standard profiling cost; swap in approx_count_distinct when
      // exactness isn't required.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        def nulls(c: String) =
          sum(when(col(c).isNull, 1).otherwise(0)).cast("long")
        val a = li.agg(
          count(lit(1)).as("n_rows"),
          nulls("l_orderkey").as("ok_nulls"),
          countDistinct(col("l_orderkey")).as("ok_d"),
          min(col("l_orderkey")).as("ok_min"),
          max(col("l_orderkey")).as("ok_max"),
          nulls("l_quantity").as("q_nulls"),
          countDistinct(col("l_quantity")).as("q_d"),
          min(col("l_quantity")).as("q_min"),
          max(col("l_quantity")).as("q_max"),
          nulls("l_extendedprice").as("ep_nulls"),
          countDistinct(col("l_extendedprice")).as("ep_d"),
          min(dec(col("l_extendedprice"))).as("ep_min"),
          max(dec(col("l_extendedprice"))).as("ep_max"),
          nulls("l_returnflag").as("rf_nulls"),
          countDistinct(col("l_returnflag")).as("rf_d"),
          min(col("l_returnflag")).as("rf_min"),
          max(col("l_returnflag")).as("rf_max"),
          nulls("l_shipdate").as("sd_nulls"),
          countDistinct(col("l_shipdate")).as("sd_d"),
          min(col("l_shipdate")).as("sd_min"),
          max(col("l_shipdate")).as("sd_max"))
        def row(name: String, p: String, minV: Column, maxV: Column) =
          struct(lit(name).as("col_name"), col("n_rows"),
            col(s"${p}_nulls").as("n_nulls"), col(s"${p}_d").as("n_distinct"),
            minV.as("min_v"), maxV.as("max_v"))
        def ts(c: Column) =
          date_format(c.cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        a.select(explode(array(
            row("l_extendedprice", "ep",
              col("ep_min").cast("string"), col("ep_max").cast("string")),
            row("l_orderkey", "ok",
              col("ok_min").cast("string"), col("ok_max").cast("string")),
            row("l_quantity", "q", col("q_min").cast("long").cast("string"),
              col("q_max").cast("long").cast("string")),
            row("l_returnflag", "rf", col("rf_min"), col("rf_max")),
            row("l_shipdate", "sd", ts(col("sd_min")), ts(col("sd_max")))))
            .as("r"))
          .select(col("r.col_name").as("col_name"),
            col("r.n_rows").as("n_rows"), col("r.n_nulls").as("n_nulls"),
            col("r.n_distinct").as("n_distinct"),
            col("r.min_v").as("min_v"), col("r.max_v").as("max_v"))
          .orderBy(col("col_name"))
      },
      Some("""WITH a AS (SELECT COUNT(*) n_rows,
          SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) ok_nulls,
          COUNT(DISTINCT l_orderkey) ok_d,
          MIN(l_orderkey) ok_min, MAX(l_orderkey) ok_max,
          SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) q_nulls,
          COUNT(DISTINCT l_quantity) q_d,
          MIN(l_quantity) q_min, MAX(l_quantity) q_max,
          SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) ep_nulls,
          COUNT(DISTINCT l_extendedprice) ep_d,
          MIN(CAST(l_extendedprice AS DECIMAL(12,2))) ep_min,
          MAX(CAST(l_extendedprice AS DECIMAL(12,2))) ep_max,
          SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) rf_nulls,
          COUNT(DISTINCT l_returnflag) rf_d,
          MIN(l_returnflag) rf_min, MAX(l_returnflag) rf_max,
          SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) sd_nulls,
          COUNT(DISTINCT l_shipdate) sd_d,
          MIN(l_shipdate) sd_min, MAX(l_shipdate) sd_max
        FROM lineitem)
        SELECT * FROM (
          SELECT 'l_extendedprice' AS col_name, n_rows,
            CAST(ep_nulls AS BIGINT) AS n_nulls, ep_d AS n_distinct,
            CAST(ep_min AS VARCHAR) AS min_v, CAST(ep_max AS VARCHAR) AS max_v
            FROM a
          UNION ALL SELECT 'l_orderkey', n_rows, CAST(ok_nulls AS BIGINT),
            ok_d, CAST(ok_min AS VARCHAR), CAST(ok_max AS VARCHAR) FROM a
          UNION ALL SELECT 'l_quantity', n_rows, CAST(q_nulls AS BIGINT),
            q_d, CAST(CAST(q_min AS BIGINT) AS VARCHAR),
            CAST(CAST(q_max AS BIGINT) AS VARCHAR) FROM a
          UNION ALL SELECT 'l_returnflag', n_rows, CAST(rf_nulls AS BIGINT),
            rf_d, rf_min, rf_max FROM a
          UNION ALL SELECT 'l_shipdate', n_rows, CAST(sd_nulls AS BIGINT),
            sd_d, strftime(sd_min, '%Y-%m-%d %H:%M:%S'),
            strftime(sd_max, '%Y-%m-%d %H:%M:%S') FROM a)
        ORDER BY col_name"""))
  )
}
