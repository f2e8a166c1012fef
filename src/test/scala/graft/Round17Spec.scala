package graft

import org.apache.spark.sql.functions._

/** Round-17 wave (VERDICT r16): the RocksDB session remedy must BOUND
  * resident state to open sessions (eviction demonstrated per batch
  * via the state data source, not just output parity); knn_graph's
  * gate-scale plan must carry no explicit exchanges (the r15 shape);
  * and the pin re-seeder must refuse unadjudicated pin raises
  * (regression laundering).
  */
class Round17Spec extends SparkSuite {

  test("stream_timer_sessions: resident state tracks OPEN sessions, not corpus history") {
    // Drive the bounded drain (4 bucket files → 4 watermark ratchets)
    // with a checkpoint, then read the "open" ValueState back per
    // micro-batch. Eviction working = after each ratchet the state
    // holds EXACTLY the users whose latest session the watermark has
    // not yet expired; eviction broken = state accumulates one row per
    // user ever seen, and the final equality below fails.
    val (closed, ckptOpt) =
      StreamOps.timerSessionsDrain(spark, sfDir, checkpointed = true)
    val nClosed = closed.count()
    assert(nClosed > 0, "drain must close sessions")
    val ckpt = ckptOpt.get

    val gap = StreamOps.TimerSessGapUs
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val Array(lo, hi) = ev.agg(min(col("us")), max(col("us")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val span = hi - lo + 1
    val totalUsers = ev.select(col("user_id")).distinct().count()

    // expected resident state after batch b: among users seen in
    // files 0..b, those whose latest event's session expiry
    // (ceil-to-ms of end + gap — TimerSessProcessor.expiryMs) is
    // still ABOVE the watermark the batch ran under (= ms-floor of
    // the max event time of files 0..b-1; batch 0 runs before any
    // watermark, so no timer fires and every seen user is resident)
    def expectedOpen(prefixHiExclusive: Long, wmUs: Option[Long]): Long = {
      val seen = ev.filter(col("us") < lit(prefixHiExclusive))
        .groupBy(col("user_id")).agg(max(col("us")).as("end_us"))
      wmUs match {
        case None => seen.count()
        case Some(w) =>
          seen.filter(expr(s"(end_us + ${gap + 999L}) div 1000")
            > lit(w / 1000)).count()
      }
    }
    def fileHi(i: Int): Long = lo + span * (i + 1) / 4 // exclusive
    def fileMax(i: Int): Long = // max actual event us in files 0..i
      ev.filter(col("us") < lit(fileHi(i))).agg(max(col("us")))
        .head().getLong(0)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val commits = new java.io.File(s"$ckpt/commits").list()
        .filter(_.forall(_.isDigit)).map(_.toLong).sorted
      assert(commits.length >= 4,
        s"expected >=4 committed batches, got ${commits.mkString(",")}")
      val perBatch = commits.map { b =>
        val rows = StreamOps.timerOpenState(spark, ckpt, Some(b)).count()
        // data batches 0..3 consume file b; later batches (the
        // no-data timer-flush batch) consume nothing
        val dataIdx = math.min(b, 3L).toInt
        val wm = if (b == 0) None else Some(fileMax(math.min(b - 1, 3L).toInt))
        val exp = expectedOpen(fileHi(dataIdx), wm)
        (b, rows, exp)
      }
      perBatch.foreach { case (b, rows, exp) =>
        assert(rows == exp,
          s"batch $b: resident state $rows != expected open $exp " +
            s"(history=${perBatch.map(t => s"${t._1}:${t._2}/${t._3}")
              .mkString(" ")})")
      }
      // the bounding claim itself: closed sessions left the store —
      // resident rows are a strict subset of users ever seen
      val finalRows = perBatch.last._2
      assert(finalRows < totalUsers,
        s"state still holds $finalRows of $totalUsers users — " +
          "timer eviction is not bounding state")
      assert(nClosed >= totalUsers - finalRows,
        "every evicted user must have emitted at least one closed session")
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  test("knn_graph: gate-scale auto plan carries NO explicit repartition") {
    // ADVICE r16 / VERDICT r16 #4: when the data-scaled partition
    // count lands on the session default, the explicit exchanges must
    // disappear (the cell join's own shuffle already partitions both
    // sides) — the r15 plan shape. Forced counts keep the exchange.
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
    def nRepart(df: org.apache.spark.sql.DataFrame): Int =
      castToImpl(df).queryExecution.optimizedPlan.collect {
        case r: RepartitionOperation => r
      }.size
    // fixture corpus is far below the 160k-row gate → session default
    val auto = SimilarityOps.knnGraph(spark, sfDir)
    assert(nRepart(auto) == 0,
      "gate-scale auto plan still carries an explicit repartition")
    val forced = SimilarityOps.knnGraph(spark, sfDir, Some(7))
    assert(nRepart(forced) >= 2,
      "forced partitioning must keep the explicit exchanges")
    // and the exchange is only ever an optimization: same output
    assert(auto.collect().map(_.toSeq).toSeq ==
      forced.collect().map(_.toSeq).toSeq)
  }

  test("knn_graph: pair-keyed mutualize is an invisible optimization") {
    // r17 stage-split finding: the reciprocation self-join re-ran the
    // scan+topk pipeline for its second input. The groupBy-unordered-
    // pair formulation must produce the bit-identical mutual graph.
    val pair = SimilarityOps.knnGraphPlan(spark, sfDir).mutual
    val selfJoin = SimilarityOps
      .knnGraphPlan(spark, sfDir, selfJoinMutual = true).mutual
    val p = pair.collect().map(_.toSeq).toSeq
    assert(p.nonEmpty, "fixture graph must have mutual edges")
    assert(p == selfJoin.collect().map(_.toSeq).toSeq,
      "mutualize formulation changed the graph")
  }

  test("knn_graph: candidate volume equals the index arithmetic") {
    // The cluster-relevant scale metric behind SURVEY §18/§19's
    // n^1.5 claim: the cell join's shuffled candidate rows are
    // EXACTLY Σ_cells occ(c)·probes(c) − n (every vector's own cell
    // is its top-1 probe, so n self-pairs are filtered). index_stats
    // extrapolates this arithmetic across decades; this pins the
    // extrapolation to the physical row count at fixture scale.
    val p = SimilarityOps.knnGraphPlan(spark, sfDir)
    val occ = SimilarityOps.assignedCached(spark, sfDir)
      .groupBy(col("cell")).agg(count(lit(1)).as("occ"))
    val pr = p.probes.groupBy(col("cell")).agg(count(lit(1)).as("np"))
    val crossTotal = occ.join(pr, "cell")
      .agg(sum(col("occ") * col("np"))).head().getLong(0)
    val n = SimilarityOps.corpusCount(spark, sfDir)
    assert(p.scored.count() == crossTotal - n,
      s"candidates != Σ occ·probes − n ($crossTotal - $n)")
  }

  test("Scratch: entry scratch caches drain back to baseline") {
    // r17 suite-hygiene wave: per-entry scratch persists (ngram gram
    // blocks, substring winnow fingerprints, ...) must be RELEASED by
    // the harness drain, not pinned for the rest of a 221-entry run
    // (the 48 g sf10 OOM at entry 218). Memoized per-session INDEX
    // caches stay — the first run below materializes them, so the
    // post-drain set must return exactly to that baseline.
    for (name <- Seq("dedup_ngram_jaccard", "dedup_substring")) {
      SparkEntry.queries(name)(spark, sfDir).count()
      Scratch.drain(spark)
      val baseline = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(name)(spark, sfDir).count()
      val during = spark.sparkContext.getPersistentRDDs.keySet
      assert((during -- baseline).nonEmpty,
        s"$name registered no scratch — did a site lose Scratch.reg?")
      Scratch.drain(spark)
      val after = spark.sparkContext.getPersistentRDDs.keySet
      assert(after == baseline,
        s"$name leaked scratch caches: ids ${after -- baseline}")
    }
  }

  test("reseed_pins.py refuses unadjudicated pin raises (self-test)") {
    // VERDICT r16 #3: the guard's own scenario matrix (raise>cap
    // without override = exit 1; with override = pass; sub-cap = pass)
    // lives in the tool; the spec makes it part of `sbt test`.
    val rc = scala.sys.process.Process(
      Seq("python3", "tools/reseed_pins.py", "--selftest"),
      new java.io.File(".")).!
    assert(rc == 0, "tools/reseed_pins.py --selftest failed")
  }
}
