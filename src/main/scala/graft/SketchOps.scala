package graft

import org.apache.spark.sql.functions._

import Tables._

/** Sketch-accelerated operators (SURVEY.md §2.B round 2): Bloom-filter
  * semi-join pruning, count-min heavy hitters, HLL sketch union. Each
  * follows the same contract: the sketch is a PRE-FILTER whose false
  * positives are removed by an exact verify, so the result is bit-equal
  * to the sketch-free query (and therefore DuckDB-oracled) while the
  * expensive side ships/shuffles only surviving rows.
  *
  * 100 TB story: a semi-join against a selective dimension normally
  * shuffles the whole fact table; a ~MB Bloom filter broadcast to every
  * executor drops non-candidate rows AT THE SCAN, the same mechanism as
  * Spark's AQE runtime row-filtering but available explicitly, composable
  * and testable. Likewise CMS bounds candidate heavy-hitter keys without
  * a first full aggregation pass.
  */
object SketchOps {

  val entries: Seq[Entry] = Seq(
    Entry(
      "q42_bloom_semijoin",
      // Lineitems of urgent orders: Bloom(o_orderkey) prunes the fact
      // scan (no false negatives), the left-semi join removes the Bloom
      // false positives — result identical to the plain semi-join.
      (s, dir) => {
        val keys = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val bf = keys.stat.bloomFilter("o_orderkey", 200000, 0.01)
        val bfB = s.sparkContext.broadcast(bf)
        val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
        t(s, dir, "lineitem")
          .filter(mightContain(col("l_orderkey"))) // coarse: scan-side prune
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
        val cmsB = s.sparkContext.broadcast(cms)
        val mightBeHeavy = udf((k: Long) =>
          20L * cmsB.value.estimateCount(k) * nsupp >= 21L * total)
        li.filter(mightBeHeavy(col("l_suppkey"))) // coarse candidate rows
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
      "q44_hll_union",
      // Mergeable distinct-count sketches: one HLL per day over
      // user_id, unioned into the overall estimate — the pattern for
      // incremental/partitioned distinct counts at 100 TB (sketches
      // merge associatively; no re-scan of history). Rows-only (approx
      // estimates have no exact SQL twin); SketchSpec pins accuracy
      // against exact distinct counts.
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val perDay = daily.select(col("day"),
          hll_sketch_estimate(col("sk")).as("est_users"))
        val overall = daily.agg(hll_union_agg(col("sk")).as("sk"))
          .select(lit("__ALL__").as("day"),
            hll_sketch_estimate(col("sk")).as("est_users"))
        perDay.unionByName(overall).orderBy(col("day"))
      },
      None),

    Entry(
      "q62_approx_quantile",
      // Mergeable quantile sketch (approx_percentile): p50/p90/p99 per
      // event type in one pass, partial sketches merging map-side —
      // the scale path when exact percentile (q23's full sort per
      // group) is too expensive. Rows-only like the other sketches;
      // SketchSpec pins each estimate inside a ±2-percentile-rank
      // bracket of the exact distribution.
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(expr(
            "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)")
            .as("q"))
          .select(col("event_type"),
            col("q")(0).as("p50"), col("q")(1).as("p90"),
            col("q")(2).as("p99"))
          .orderBy(col("event_type")),
      None)
  )
}
