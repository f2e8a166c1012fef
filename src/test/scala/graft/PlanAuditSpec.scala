package graft

/** Plan-shape proofs for the newest operators — the properties that
  * decide 100 TB viability, asserted on the physical plan so a
  * refactor can't silently regress them.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(name: String): String =
    q(name, sfDir).queryExecution.executedPlan.toString

  test("dedup_decontaminate: eval grams broadcast; no cartesian anywhere") {
    val p = plan("dedup_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q84 BFS: final plan is materialized levels only — no join replay") {
    // each hop's expansion (join + anti-join) ran ONCE during the loop;
    // the returned plan must be just the union of checkpointed levels,
    // proving no per-action re-execution of the whole BFS.
    val p = plan("q84_bfs_hops")
    assert(p.contains("Scan ExistingRDD"), p.take(500))
    assert(!p.contains("Join"), p.take(800))
  }

  test("q82 closure: frontier levels are checkpointed scans, no recursion in-plan") {
    // every closure level must appear as a materialized RDD scan — the
    // final plan must NOT re-derive level k from level k-1 (the
    // re-execution trap); one join over the unioned levels only.
    val p = plan("q82_bom_closure")
    assert(p.contains("Scan ExistingRDD"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("q85 rolling median: single window pass, one shuffle on user_id") {
    val p = plan("q85_rolling_median")
    // exactly one exchange below the window (plus the final global sort)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p.take(800))
  }

  test("knn_ivf: corpus cell assignment is a projection — no Window in the plan") {
    // nearest-centroid argmax must stay a broadcast-array fold, never
    // the crossJoin + Window.partitionBy(vec_id) corpus sort-shuffle
    // (the 10-row probe side may keep its window); the corpus-side
    // aggregation is the k-bounded per-query top-k
    val p = plan("knn_ivf")
    assert(!p.contains("hashpartitioning(vec_id"), p.take(800))
    assert(p.contains("graft_topk"), p.take(800))
  }

  test("knn_brute: no corpus shuffle before the top-k aggregate") {
    val p = plan("knn_brute")
    assert(!p.contains("Window"), p.take(800))
    // the only hash exchange is the 10-row-per-task top-k partial agg
    assert("hashpartitioning\\(qid".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("knn_range: τ filter in the scan projection — no corpus shuffle") {
    // ADVICE r9: pin the comment's claim. The only exchange allowed is
    // the final orderBy's range partitioning of the MATCHES; the
    // corpus side must reach the sim filter unshuffled (broadcast
    // queries, no Window, no hash exchange).
    val p = plan("knn_range")
    assert(!p.contains("Window"), p.take(800))
    assert(!"hashpartitioning".r.findAllIn(p).hasNext, p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(800))
  }

  test("knn_ivf_range: probes broadcast; corpus side stays unshuffled to the τ filter") {
    // same contract as knn_range plus the cell-prune join: assignments
    // join the tiny probe set via BROADCAST hash join on cell — the
    // corpus must never hash-exchange (rangepartitioning for the final
    // sort of matches only).
    val p = plan("knn_ivf_range")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!"hashpartitioning\\(vec_id".r.findAllIn(p).hasNext, p.take(800))
  }

  test("text_lm_score: integer-sum agg, no per-doc array fold, no cartesian") {
    // scoring must stay the quantized-integer hash aggregation: one
    // doc_id exchange, equi-join on the bigram key, and NO collect_list
    // / sort-based fold (the interpreted-ArrayAggregate trap) anywhere
    val p = plan("text_lm_score")
    assert(!p.contains("collect_list") && !p.contains("aggregate("),
      p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size == 1,
      p.take(1200))
  }

  test("q71: variant blocking is an equi-join; name lookups broadcast") {
    // the FastSS candidate join must plan as a HASH EQUI-join on the
    // slim bk key — never a cartesian/nested-loop (at the toy test SF
    // AQE broadcasts it; at scale the same equi-join shuffles on bk)
    val p = plan("q71_fuzzy_match")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // partitioned-join-hinted since the sf10 decade (planner
    // under-sizes the variant explode and broadcasts a 100 M-row side
    // otherwise; shuffle_hash since r14 — skips the two 100 M-row
    // sorts) — accept either equi-join form, never a nested loop
    assert("(SortMergeJoin|HashJoin) \\[bk".r.findAllIn(p).nonEmpty,
      p.take(1200))
  }

  test("probeIndex: assignments scan prunes to the probed cells' partitions") {
    // stream_knn / knn_ivf_persist serve from the cell-PARTITIONED
    // on-disk index; the probe joins assignments on the `cell`
    // partition column against a broadcast probe set, and the scan
    // must read ONLY the probed cells' files (the on-disk form of IVF
    // posting-list pruning — at 100 TB this is the difference between
    // reading nProbe cells and the whole corpus). Asserted on the
    // EXECUTED plan's numFiles metric with AQE + codegen on, like
    // PartitionPruningSpec does for day partitions.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val dir = "/root/testdata/sf0.01" // sf0.001 trains 1 cell — no bound
    val idx = SimilarityOps.ensureIndex(spark, dir)
    val totalCells = spark.read.parquet(s"$idx/assignments")
      .select(col("cell")).distinct().count()
    assert(totalCells > 2, s"corpus trained only $totalCells cells")
    val q1 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"),
        graft.functions.Vectors.normalized(col("embedding")).as("qvec"))
    val probed = SimilarityOps.probeIndex(spark, idx, q1, nProbe = 2, k = 3)
    assert(probed.count() == 3)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
    }.flatten
    val asgScan = scans(probed.queryExecution.executedPlan)
      .find(_.output.exists(_.name == "vec_id"))
      .getOrElse(fail("no assignments scan in plan"))
    val nFiles = asgScan.metrics("numFiles").value
    // one file per cell (writeIndex's repartition guard): 1 query x
    // nProbe=2 cells means the scan may touch at most 2 files
    assert(nFiles <= 2,
      s"assignments scan read $nFiles files for 2 probed of $totalCells cells")
  }

  test("bpe_apply: encoding is a pure projection — no agg/join shuffle") {
    // the merge table is a session-cached literal list; applying it
    // must plan as a chain of per-row transforms. The only exchange
    // allowed is the final presentation sort (rangepartitioning) —
    // any hashpartitioning means a join or aggregate snuck into the
    // 100 TB encode path.
    q("bpe_apply", sfDir).count() // warm the merge-table cache
    val p = plan("bpe_apply")
    assert(!p.contains("hashpartitioning"), p.take(1000))
    assert(!p.contains("Join"), p.take(1000))
  }

  test("emb_quantize: pure projection — no shuffle but the final sort") {
    val p = plan("emb_quantize")
    assert(!p.contains("hashpartitioning"), p.take(1000))
    assert(!p.contains("Join"), p.take(1000))
  }

  // The per-row projection family: at 100 TB these run as map-only
  // passes over the corpus, so ANY hash exchange or join in their plan
  // is a regression (the only exchange allowed is the final
  // presentation sort's rangepartitioning). One parameterized assert
  // per entry so a refactor that sneaks in a groupBy/join fails by
  // name.
  private val ProjectionEntries = Seq(
    "text_normalize", "text_tokens", "text_quality", "text_pii_scrub",
    "text_url_canon", "text_quality_filter", "text_langid",
    "text_repetition", "text_chunk", "text_fingerprint",
    "mm_meta", "mm_resize", "mm_framesample",
    "corpus_csv", "corpus_jsonl", "corpus_orc")

  ProjectionEntries.foreach { name =>
    test(s"$name: map-only projection — no hash exchange, no join") {
      val p = plan(name)
      assert(!p.contains("hashpartitioning"), s"$name: ${p.take(1000)}")
      assert(!p.contains("Join"), s"$name: ${p.take(1000)}")
    }
  }

  test("knn_hybrid: lexical side is JOIN-FREE — plan-literal scoring") {
    // r18 (VERDICT r17 #4): the per-query (term → idf) maps fold into
    // plan literals, so the lexical ranking carries NO equi-join at
    // all — a reappearing BroadcastHashJoin would mean the posting
    // join crept back. The dense side keeps knn_brute's broadcast
    // cross (BNLJ is the intentional broadcast-queries fan-out, not a
    // planning accident), and both rankings run through the k-bounded
    // TopKAgg.
    val p = plan("knn_hybrid")
    assert(!p.contains("CartesianProduct"), p.take(1000))
    assert(!p.contains("BroadcastHashJoin"), p.take(1000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    assert(p.contains("graft_topk"), p.take(1000))
  }

  test("text_boiler_ngrams: gram recount joins on the gram key — no cartesian") {
    val p = plan("text_boiler_ngrams")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }

  test("text_entropy: lnq lookups broadcast — no cartesian, no corpus sort") {
    val p = plan("text_entropy")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }

  test("mix_curriculum: stage assignment is join-free — weights are plan literals") {
    // the classifier weight vector rides as a literal and the stage
    // cuts are integer projections, so the ONLY exchanges are the
    // (stage, shard) window partitioning and the presentation sort
    val p = plan("mix_curriculum")
    assert(!p.contains("Join"), p.take(1000))
  }

  test("emb_outliers: bottom-k is a TakeOrdered heap — no corpus-wide window") {
    val p = plan("emb_outliers")
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
  }

  test("mm_phash: hamming pairing buckets on (blk, bkey) — no cartesian") {
    val p = plan("mm_phash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }

  test("mm_phash_real: real-codec pairing keeps the same bucketed shape") {
    val p = plan("mm_phash_real")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }

  test("q71_fuzzy_capped: candidate pairing is join-free; " +
      "no cartesian anywhere") {
    // the capped variant's scale contract: candidate pairs explode
    // inside each ≤cap-element bucket array (a Generate, never a
    // self-join that could mis-plan); the only joins are the two
    // key-equi name lookups
    val p = plan("q71_fuzzy_capped")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("Generate explode"), p.take(1200))
  }

  test("dedup_semantic: pairwise stays within cells — one cell join, no cartesian") {
    // the defining scale property: the pairwise self-join must KEY on
    // cell (bounded occupancy blocks), never an all-pairs cross. The
    // cached index (InMemoryRelation) embeds its one-time BUILD plan —
    // whose centroid assignment legitimately uses a broadcast
    // nested-loop fan-out — so the pin asserts the serving join's key
    // rather than a tree-wide no-BNLJ.
    val p = plan("dedup_semantic")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell"
      .r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("dedup_semantic_incremental: probe joins history on cell only") {
    val p = plan("dedup_semantic_incremental")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell"
      .r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("dedup_recall_report: all-pairs is sample-bounded broadcast, candidates bucket-joined") {
    // the truth side's BNLJ is the INTENTIONAL bounded-sample
    // all-pairs (broadcast, constant-size at any corpus scale); the
    // candidate side must still come from the (band, bkey) equi-join
    val p = plan("dedup_recall_report")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    assert(!p.contains("CartesianProduct"), p.take(1000))
  }

  test("pq_recall_report: both retrievals stay TopKAgg-bounded") {
    val p = plan("pq_recall_report")
    assert(p.contains("graft_topk"), p.take(1000))
    assert(!p.contains("CartesianProduct"), p.take(1000))
  }

  test("no tokenizing entry re-evaluates split inside a lambda (O(tokens²) guard)") {
    // CollapseProject counts only references outside lambda bodies, so
    // an alias used (almost) exclusively inside a higher-order
    // function's lambda gets its defining split() inlined and the doc
    // re-tokenizes once per element — the r14 lm-bigram pathology
    // (25 s -> 1.5 s at sf1). Guard every entry family that tokenizes.
    // bpe_* is exempt: its merge fold re-splits one WORD's char-seq
    // string (a lambda variable) per level by design — bounded by word
    // length, not document length.
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    val families = Seq("text_", "dedup_", "corpus_", "mix_", "pipeline_",
      "sample_", "pack_", "dq_")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => families.exists(n.startsWith))
    val bad = names.filter { n =>
      val plan = q(n, sfDir).queryExecution.optimizedPlan.toString
      graft.plans.PlanHygiene.lambdaReevaluatesSplit(plan)
    }
    assert(bad.isEmpty, s"per-element re-tokenization in: $bad")
  }

  test("u2_bulk_ingest: assembly is map-only — correlation adds no shuffle") {
    // single-pass per-file assembly: the only exchanges allowed are the
    // cid windows' per-(sensor, file) partitioning and the tiny
    // broadcast dims; the event/packet/extra correlation join keys
    // (sensor_id, event_id, event_second) must NOT appear in any
    // hashpartitioning
    val p = plan("u2_bulk_ingest")
    assert(!p.contains("hashpartitioning(sensor_id"), p.take(1000))
    assert(!"hashpartitioning\\([^)]*event_id".r.findFirstIn(p).isDefined,
      p.take(1000))
  }
}
