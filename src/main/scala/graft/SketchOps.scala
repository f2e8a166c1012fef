package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Sketch-accelerated operators (SURVEY.md §2.B round 2): Bloom-filter
  * semi-join pruning, count-min heavy hitters, HLL sketch union,
  * mergeable quantile sketches. Two oracle contracts are in play:
  *
  *  - PRE-FILTER sketches (q42, q43): the sketch only ADDS candidates
  *    (no false negatives) and an exact verify removes its false
  *    positives, so the result is bit-equal to the sketch-free query
  *    and DuckDB-oracles directly.
  *  - ESTIMATE sketches (q28, q44, q62): the sketch output is an
  *    approximation with no exact SQL twin, so the entry emits the
  *    EXACT value (computable by both engines) plus a `within_tol`
  *    flag that Spark derives by bracket-checking its own estimate
  *    against the exact answer; the oracle emits the same exact value
  *    and a literal 1. A hash-match therefore machine-proves "the
  *    sketch ran AND landed inside its published error bound" — the
  *    estimate path stays in the measured plan, and a sketch gone
  *    wrong flips the flag to 0 and fails the oracle (VERDICT r11 #1).
  *
  * 100 TB story: a semi-join against a selective dimension normally
  * shuffles the whole fact table; a ~MB Bloom filter broadcast to every
  * executor drops non-candidate rows AT THE SCAN, the same mechanism as
  * Spark's AQE runtime row-filtering but available explicitly, composable
  * and testable. Likewise CMS bounds candidate heavy-hitter keys without
  * a first full aggregation pass, and HLL/KLL sketches merge
  * associatively so partitioned/incremental distinct-and-quantile
  * states never re-scan history.
  */
object SketchOps {

  val entries: Seq[Entry] = Seq(
    Entry(
      "q42_bloom_semijoin",
      // Lineitems of urgent orders: Bloom(o_orderkey) prunes the fact
      // scan (no false negatives), the left-semi join removes the Bloom
      // false positives — result identical to the plain semi-join.
      // The probe is Spark's NATIVE bloom_filter_agg/might_contain
      // (the same machinery as AQE runtime row-level filtering): the
      // filter builds in one scalar-subquery aggregate and the probe
      // stays inside whole-stage codegen — no Scala UDF boundary, no
      // driver-side .stat.bloomFilter collect (VERDICT r11 #4).
      (s, dir) => {
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.graft.DatasetBridge
        val keys = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        // ~1.92M bits = optimal for 200k items @ 1% fpp
        val bf = keys.agg(DatasetBridge.column(
          new BloomFilterAggregate(
            DatasetBridge.expression(xxhash64(col("o_orderkey"))),
            Literal(200000L), Literal(1917011L)).toAggregateExpression())
          .as("bf"))
        val probe = DatasetBridge.column(BloomFilterMightContain(
          DatasetBridge.scalarSubquery(bf),
          DatasetBridge.expression(xxhash64(col("l_orderkey")))))
        t(s, dir, "lineitem")
          .filter(probe) // coarse: codegen'd scan-side prune
          .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Entry(
      "q43_cms_heavy_hitters",
      // Suppliers with >1.05× the average lineitem share. The count-min
      // sketch (estimate >= truth, never below) prefilters fact rows to
      // candidate keys; the exact group-count then applies the same
      // threshold, eliminating CMS overestimates. The threshold compare
      // is pure integer arithmetic (20·cnt·nsupp >= 21·total) so both
      // engines decide borderline keys identically.
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey"))
        val tot = li.agg(count(lit(1)).as("total"),
          countDistinct(col("l_suppkey")).as("nsupp")).head()
        val (total, nsupp) = (tot.getLong(0), tot.getLong(1))
        val cms = li.stat.countMinSketch(col("l_suppkey"), 0.0001, 0.999, 42)
        // native probe (graft.functions.Sketches): the prefilter
        // compiles into the scan's codegen span instead of a UDF row
        // boundary; the sketch rides the broadcast task binary
        val mightBeHeavy = lit(20L) *
          graft.functions.Sketches.cmsEstimate(cms, col("l_suppkey")) *
          lit(nsupp) >= lit(21L) * lit(total)
        li.filter(mightBeHeavy) // coarse candidate rows
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
          .filter(lit(20L) * col("cnt") * nsupp >= lit(21L) * total)
          .orderBy(col("l_suppkey"))
      },
      Some("""WITH tot AS (SELECT COUNT(*) AS total,
          COUNT(DISTINCT l_suppkey) AS nsupp FROM lineitem),
        c AS (SELECT l_suppkey, COUNT(*) AS cnt
          FROM lineitem GROUP BY l_suppkey)
        SELECT l_suppkey, cnt FROM c, tot
        WHERE 20 * cnt * nsupp >= 21 * total
        ORDER BY l_suppkey""")),

    Entry(
      "q28_approx_distinct",
      // Mergeable distinct-count sketch (HLL++ via
      // approx_count_distinct, default rsd 5%): per-event-type distinct
      // users in one pass with O(kB) state per group — the scale path
      // when exact COUNT(DISTINCT) must shuffle every key. Oracle
      // contract: emit the EXACT count (both engines) plus a
      // within_tol flag Spark computes by bracketing its own estimate
      // at ±3σ (15%) + 10 absolute slack for tiny groups; the oracle
      // emits literal 1, so a hash-match proves the sketch ran inside
      // its error bound.
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id")).as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"))
          .select(col("event_type"), col("exact_users"), col("n"),
            when(abs(col("approx_users") - col("exact_users")) <=
              col("exact_users") * 0.15 + lit(10), 1L).otherwise(0L)
              .as("within_tol"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
        COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n,
        CAST(1 AS BIGINT) AS within_tol
        FROM events GROUP BY event_type ORDER BY event_type""")),

    Entry(
      "q44_hll_union",
      // Mergeable distinct-count sketches: one Datasketches HLL per day
      // over user_id, unioned into the overall estimate — the pattern
      // for incremental/partitioned distinct counts at 100 TB (sketches
      // merge associatively; no re-scan of history). Same bracket-check
      // oracle contract as q28: exact count + within_tol flag (HLL
      // lgConfigK=12 → rsd ≈1.6%; 10% + 10 absolute is >5σ slack).
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("user_id"))
        val daily = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("exact_users"))
        val perDay = daily.select(col("day"), col("exact_users"),
          hll_sketch_estimate(col("sk")).as("est_users"))
        val overall = daily.agg(hll_union_agg(col("sk")).as("sk"))
          .crossJoin(
            ev.agg(countDistinct(col("user_id")).as("exact_users")))
          .select(lit("__ALL__").as("day"), col("exact_users"),
            hll_sketch_estimate(col("sk")).as("est_users"))
        perDay.unionByName(overall)
          .select(col("day"), col("exact_users"),
            when(abs(col("est_users") - col("exact_users")) <=
              col("exact_users") * 0.10 + lit(10), 1L).otherwise(0L)
              .as("within_tol"))
          .orderBy(col("day"))
      },
      Some("""SELECT day, exact_users, CAST(1 AS BIGINT) AS within_tol
        FROM (
          SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
            AS day, COUNT(DISTINCT user_id) AS exact_users
          FROM events GROUP BY 1
          UNION ALL
          SELECT '__ALL__', COUNT(DISTINCT user_id) FROM events
        ) ORDER BY day""")),

    Entry(
      "q62_approx_quantile",
      // Mergeable quantile sketch (approx_percentile, accuracy 10000 →
      // rank error ≤ n/10000): p50/p90/p99 per event type in one pass,
      // partial sketches merging map-side — the scale path when exact
      // percentile (q23's full sort per group) is too expensive.
      // Bracket-check oracle contract: emit the exact DISCRETE
      // percentile (value at ceil(p·n), integer-exact in both engines —
      // the q67 formula) plus a within_tol flag proving each estimate
      // lies inside the exact ±2-percentile-rank value bracket.
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
        val wn = Window.partitionBy(col("event_type"))
        val ranked = ev.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
        // value at ceil(k%·n) in pure integer math; k may exceed 100
        // for the upper p99 bracket — clamp to n
        def pick(k: Int, name: String) =
          max(when(col("rn") ===
            least(expr(s"($k * n + 99) DIV 100"), col("n")), col("value")))
            .as(name)
        val exact = ranked.groupBy(col("event_type")).agg(
          pick(50, "p50"), pick(90, "p90"), pick(99, "p99"),
          pick(48, "lo50"), pick(52, "hi50"),
          pick(88, "lo90"), pick(92, "hi90"),
          pick(97, "lo99"), pick(101, "hi99"))
        val approx = t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(expr(
            "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)")
            .as("q"))
        exact.join(approx, Seq("event_type"))
          .select(col("event_type"), col("p50"), col("p90"), col("p99"),
            when(
              col("q")(0).between(col("lo50"), col("hi50")) &&
              col("q")(1).between(col("lo90"), col("hi90")) &&
              col("q")(2).between(col("lo99"), col("hi99")), 1L)
              .otherwise(0L).as("within_tol"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
        quantile_disc(value, 0.5) AS p50,
        quantile_disc(value, 0.9) AS p90,
        quantile_disc(value, 0.99) AS p99,
        CAST(1 AS BIGINT) AS within_tol
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
