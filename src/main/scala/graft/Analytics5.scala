package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * parent < child strictly (a DAG by construction). Frontier rows are
    * materialized per level (localCheckpoint) and the previous level is
    * unpersisted as soon as the next exists.
    */
  private def closure(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir).persist()
    var frontier = e
      .select(col("child").as("part"), col("parent").as("anc"),
        lit(1).as("lvl"))
      .localCheckpoint(true)
    var levels = List(frontier)
    var iter = 0
    while (!frontier.isEmpty) {
      iter += 1
      // log-depth guarantee: parent has one decimal digit fewer
      if (iter > 20) sys.error(s"closure: no fixpoint after $iter levels")
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.anc") === col("e.child"))
        .select(col("f.part"), col("e.parent").as("anc"),
          (col("f.lvl") + 1).as("lvl"))
        .localCheckpoint(true)
      frontier = next
      if (!next.isEmpty) levels ::= next
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
        var visited = s.range(1)
          .select(lit(1L).as("node"), lit(0).as("d"))
          .localCheckpoint(true)
        var frontier = visited
        var hop = 0
        while (hop < 4 && !frontier.isEmpty) {
          hop += 1
          val next = frontier.alias("f")
            .join(und.alias("u"), col("f.node") === col("u.a"))
            .select(col("u.b").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("d", lit(hop))
            .localCheckpoint(true)
          visited = visited.union(next).localCheckpoint(true)
          frontier = next
        }
        und.unpersist()
        visited
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
          FROM events)
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
        ORDER BY d.credit_tier NULLS FIRST"""))
  )
}
