package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: the deterministic corpus shuffle's two
  * defining properties (seed determinism, partition-count
  * independence), the learned classifier's no-shuffle serving plan,
  * and the IVF incremental-refresh equivalence contract.
  */
class Round11Spec extends SparkSuite {

  private def collected(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(col("shard_id"), col("position"))
      .collect().map(_.toString).toSeq

  test("corpus_shuffle is seed-deterministic and seed-sensitive") {
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"))
    val a = collected(PipelineOps.corpusShuffle(docs, seed = 42L))
    val b = collected(PipelineOps.corpusShuffle(docs, seed = 42L))
    assert(a == b, "same seed must replay the identical order")
    val c = collected(PipelineOps.corpusShuffle(docs, seed = 43L))
    assert(a != c, "a different seed must produce a different order")
    // every doc appears exactly once — it's a permutation, not a sample
    assert(a.size == docs.count())
    // and the order is genuinely shuffled, not doc_id order
    val firstShardDocs = PipelineOps.corpusShuffle(docs, seed = 42L)
      .filter(col("shard_id") === 0).orderBy(col("position"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(firstShardDocs != firstShardDocs.sorted,
      "shard order should not degenerate to id order")
  }

  test("corpus_shuffle is independent of input partitioning") {
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"))
    val base = collected(PipelineOps.corpusShuffle(docs, seed = 42L))
    for (p <- Seq(1, 3, 17)) {
      val re = collected(
        PipelineOps.corpusShuffle(docs.repartition(p), seed = 42L))
      assert(re == base, s"order drifted at input partitions=$p")
    }
  }

  test("corpus_shuffle positions are dense per shard and shards are bounded") {
    val out = PipelineOps.corpusShuffle(
      Tables.t(spark, sfDir, "documents").select(col("doc_id")),
      seed = 42L, nShards = 4)
    val shards = out.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"), max(col("position")).as("maxp"),
        min(col("position")).as("minp"))
      .collect()
    shards.foreach { r =>
      assert(r.getAs[Long]("shard_id") >= 0 && r.getAs[Long]("shard_id") < 4)
      assert(r.getAs[Long]("minp") == 1L)
      assert(r.getAs[Long]("maxp") == r.getAs[Long]("n"),
        "positions must be dense 1..n within a shard")
    }
  }

  test("text_classify serving plan is a pure projection — zero exchanges") {
    // VERDICT r10 #5's plan pin: the weight vector is a plan literal,
    // the hash+lookup+fold happen inside the row, so inference adds NO
    // shuffle to a corpus scan (the final orderBy in the entry is
    // presentation for the oracle, not part of serving).
    val plan = TextOps.textClassify(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
    assert(!plan.contains("Join"), plan.take(1200))
  }

  test("text_classify score sign, bounds, and determinism") {
    val rows = q("text_classify", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sq = r.getAs[Long]("score_q")
      assert(r.getAs[Boolean]("pred_hq") == (sq > 0))
      val expect = sq.toDouble / 1e9 / r.getAs[Long]("n_tok")
      assert(r.getAs[Double]("score") == expect)
    }
    val again = q("text_classify", sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("knn_ivf_refresh: refresh ≡ full re-assignment at the same centroids") {
    // Cell assignment is per-row against fixed centroids, so assigning
    // only the batch and unioning must equal re-assigning base ∪ batch
    // from scratch. This is the property that makes refresh O(batch).
    val (cen, asg, radii) = SimilarityOps.refreshBase(spark, sfDir)
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Vectors.normalized(col("embedding")).as("embedding"))
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val (asg2, _) = SimilarityOps.refreshIndex(cen, asg, radii, batch)
    val incr = asg2.select(col("cell"), col("vec_id"))
      .collect().map(_.toString).sorted.toSeq
    val cenArr = cen.agg(array_sort(collect_list(
      struct(col("cell"), col("cvec")))).as("cen_arr"))
    val full = emb.crossJoin(broadcast(cenArr))
      .select(graft.functions.Vectors
          .nearestDot(col("embedding"), col("cen_arr")).as("cell"),
        col("vec_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(incr == full, "incremental refresh diverged from full rebuild")
  }

  test("knn_ivf_refresh: post-refresh radii lower-bound every member") {
    // The pruning bound is safe iff min_cdot ≤ dot(member, centroid)
    // for EVERY member of the refreshed cell — including old base
    // members (monotonicity: refresh may only grow a cell's radius).
    val (cen, asg, radii) = SimilarityOps.refreshBase(spark, sfDir)
    val batch = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Vectors.normalized(col("embedding")).as("embedding"))
      .filter(col("vec_id") % 7 === 3)
    val (asg2, radii2) = SimilarityOps.refreshIndex(cen, asg, radii, batch)
    val violations = asg2.join(cen, "cell").join(radii2, "cell")
      .withColumn("d", graft.functions.Vectors
        .dot(col("embedding"), col("cvec")))
      .filter(col("d") < col("min_cdot"))
      .count()
    assert(violations == 0, s"$violations members outside their cell radius")
  }

  test("knn_pq_refresh: incremental encode ≡ full re-encode at the same codebooks") {
    val (rcen, rcodes) = SimilarityOps.pqRefreshBase(spark, sfDir)
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Vectors.normalized(col("embedding")).as("embedding"))
    val batch = emb.filter(col("vec_id") % 7 === 3)
    val incr = rcodes
      .unionAll(SimilarityOps.encodeWithCodebooks(rcen, batch))
      .collect().map(_.toString).sorted.toSeq
    val full = SimilarityOps.encodeWithCodebooks(rcen, emb)
      .collect().map(_.toString).sorted.toSeq
    assert(incr == full, "incremental PQ encode diverged from full re-encode")
  }

  test("knn_hybrid: rrf is exactly the two-rank fusion and ranks are dense") {
    val rows = q("knn_hybrid", sfDir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L),
        "fused ranks must be dense 1..10 per query")
    }
    rows.foreach { r =>
      def term(c: String): Double =
        if (r.isNullAt(r.fieldIndex(c))) 0.0
        else 1.0 / (60 + r.getAs[Long](c))
      assert(r.getAs[Double]("rrf") == term("lex_rank") + term("vec_rank"),
        s"rrf must equal the fixed-order two-term fusion: $r")
      assert(!(r.isNullAt(r.fieldIndex("lex_rank")) &&
        r.isNullAt(r.fieldIndex("vec_rank"))),
        "a fused candidate must come from at least one list")
    }
  }

  test("knn_hybrid: a doc in both lists outranks same-position single-list docs") {
    // RRF's defining property: rank-r in BOTH lists fuses to
    // 2/(60+r), strictly above 1/(60+r) from either alone.
    val rows = q("knn_hybrid", sfDir).collect()
    val both = rows.filter(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("vec_rank")))
    assert(both.nonEmpty, "test corpus should fuse at least one doc " +
      "appearing in both the lexical and vector top-50")
  }

  test("text_boiler_ngrams: fractions bound, keep gate, and planted df signal") {
    val rows = q("text_boiler_ngrams", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler"))
      assert(b >= 0 && b <= n)
      val frac = r.getAs[Double]("boiler_frac")
      assert(frac == b.toDouble / n.toDouble)
      assert(r.getAs[Boolean]("keep") == (frac <= 0.5))
    }
    // the synthetic corpus genuinely repeats 3-grams across docs —
    // the df>=3 signal must fire somewhere or the gate is vacuous
    assert(rows.map(_.getAs[Long]("n_boiler")).sum > 0)
  }

  test("stream_classify drained == batch text_classify row-for-row") {
    val dir = sfDir
    val batch = q("text_classify", dir).collect().map(_.toString).toSeq
    val stream = q("stream_classify", dir).collect().map(_.toString).toSeq
    assert(stream == batch)
  }

  test("dq_length_hist: buckets are exact powers of two and counts total") {
    val dir = sfDir
    val rows = q("dq_length_hist", dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bkt = r.getAs[Long]("bucket")
      val lo = 1L << bkt
      val hi = (1L << (bkt + 1)) - 1
      assert(r.getAs[Long]("min_tok") >= lo && r.getAs[Long]("max_tok") <= hi,
        s"bucket $bkt must span [$lo,$hi]: $r")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val expect = Tables.t(spark, dir, "documents")
      .filter(size(filter(split(col("text"), " "),
        x => length(x) > 0)) >= 1).count()
    assert(total == expect)
  }

  test("mix_curriculum: integer stage cuts, dense in-shard positions, full cover") {
    val dir = sfDir
    val rows = q("mix_curriculum", dir).collect()
    assert(rows.nonEmpty)
    // every scored doc appears exactly once — a curriculum is a
    // partition of the corpus, not a sample
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
    assert(ids.length == q("text_classify", dir).count())
    rows.groupBy(r => (r.getAs[Long]("stage"), r.getAs[Long]("shard_id")))
      .values.foreach { rs =>
        assert(rs.map(_.getAs[Long]("position")).sorted.toSeq ==
          (1L to rs.length), "positions must be dense per (stage, shard)")
      }
    assert(rows.map(_.getAs[Long]("stage")).distinct.sorted.length > 1,
      "fixed cuts should split this corpus into multiple stages")
  }

  test("text_entropy: bounds, single-type zero, and hand-recomputed doc") {
    val dir = sfDir
    val rows = q("text_entropy", dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_types"))
      val h = r.getAs[Double]("entropy")
      assert(h >= -1e-12 && h <= math.log(n.toDouble) + 1e-9,
        s"entropy outside [0, ln n]: $r")
      if (types == 1) assert(r.getAs[Long]("entropy_q") == 0L)
    }
    // recompute one doc with the same quantized-ln scheme
    val doc = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") === 0).select(col("text"))
      .head().getString(0)
    val toks = doc.toLowerCase.split(" ").filter(_.nonEmpty)
    def lnq(k: Long) = math.round(math.log(k.toDouble) * 1e12)
    val counts = toks.groupBy(identity).map(_._2.length.toLong)
    val expectQ = toks.length * lnq(toks.length) -
      counts.map(c => c * lnq(c)).sum
    val got = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(got.getAs[Long]("entropy_q") == expectQ)
  }

  test("dedup_containment: planted exact/near dups contain each other") {
    val pairs = q("dedup_containment", Fixtures.dir).collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Double]("containment")))
    // exact dup pair (0,1): containment 1.0 in both directions
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 0L && p._3 == 1.0))
    pairs.foreach { case (a, b, c) =>
      assert(a != b); assert(c >= 0.6 && c <= 1.0)
    }
  }

  test("knn_mmr: entry replays an independent Scala greedy bit-for-bit") {
    val dir = sfDir
    // independent reimplementation: same normalize + in-order dot
    // folds, same (score DESC, vec_id ASC) tie-break, λ=0.5, k=5
    val emb = Tables.t(spark, dir, "embeddings").collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
        r.getAs[Long]("vec_id") -> v.map(_ / n)
      }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expect = (0L until 5L).flatMap { qid =>
      val cand = emb.keys.filter(_ != qid).toSeq
        .map(v => v -> dot(emb(qid), emb(v)))
        .sortBy { case (v, s) => (-s, v) }.take(20)
      val sims = cand.toMap
      var sel = Vector.empty[(Long, Long, Double)] // (step, vec, score)
      for (step <- 1 to 5) {
        val pool = cand.filterNot { case (v, _) =>
          sel.exists(_._2 == v) }
        val scored = pool.map { case (v, s) =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(x => dot(emb(x._2), emb(v))).max
          (v, if (sel.isEmpty) 0.5 * s else 0.5 * s - 0.5 * pen)
        }
        val (bv, bs) = scored.minBy { case (v, s) => (-s, v) }
        sel :+= ((step.toLong, bv, bs))
      }
      sel.map { case (st, v, sc) => (qid, st, v, sc) }
    }
    val got = q("knn_mmr", dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("step"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("mmr"))).toSeq
    assert(got == expect, "MMR greedy diverged from the reference replay")
  }

  test("knn_mmr: per-query steps are dense and distinct; step 1 is the top hit") {
    // NOTE: scores are NOT monotone across steps — with cosine in
    // [-1,1] the max-similarity penalty can be NEGATIVE (an
    // anti-similar pick earns a diversity bonus), so a later greedy
    // step may legitimately outscore step 1.
    val brute1 = q("knn_brute", sfDir).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    val rows = q("knn_mmr", sfDir).collect()
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("step"))
      assert(ordered.map(_.getAs[Long]("step")).toSeq == (1L to 5L))
      val ids = ordered.map(_.getAs[Long]("vec_id"))
      assert(ids.distinct.length == ids.length)
      assert(ids.head == brute1(qid),
        "MMR step 1 must be the undiversified nearest neighbor")
    }
  }

  test("emb_kcenter: independent greedy replay and non-decreasing coverage") {
    val dir = sfDir
    val emb = Tables.t(spark, dir, "embeddings").collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
        r.getAs[Long]("vec_id") -> v.map(_ / n)
      }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    var sel = Vector(0L)
    var expect = Vector[(Long, Long, Option[Double])]((1L, 0L, None))
    for (step <- 2 to 5) {
      val cands = emb.keys.filterNot(sel.contains).toSeq
        .map(v => v -> sel.map(s => dot(emb(v), emb(s))).max)
      val (bv, bm) = cands.minBy { case (v, m) => (m, v) }
      sel :+= bv
      expect :+= ((step.toLong, bv, Some(bm)))
    }
    val got = q("emb_kcenter", dir).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
        if (r.isNullAt(r.fieldIndex("max_dot"))) None
        else Some(r.getAs[Double]("max_dot")))).toVector
    assert(got == expect, "k-center traversal diverged from the replay")
    // coverage monotonicity: as the set grows, the farthest remaining
    // point can only get CLOSER (max_dot non-decreasing over steps)
    val mds = got.drop(1).map(_._3.get)
    assert(mds.zip(mds.tail).forall { case (a, b) => b >= a }, mds)
  }

  test("mm_phash: exact-dup payloads collide at hamming 0 on the fixture") {
    val pairs = q("mm_phash", Fixtures.dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("hamming")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L),
      s"identical payloads must share the perceptual hash: ${pairs.toSeq}")
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 3)
    }
  }

  test("dedup_threshold_report: fixture mass lands in the exact integer bins") {
    // fixture candidates: the exact pair (0,1) at jaccard 1.0 → bin 9
    // (capped), and the near pair(s) at 23/29 ≈ 0.793 → 230//29 = 7
    val rows = q("dedup_threshold_report", Fixtures.dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("min_j"),
          r.getAs[Double]("max_j"))).toMap
    assert(rows.contains(9L) && rows(9L)._3 == 1.0,
      s"exact-dup pair must land in the top bin: $rows")
    assert(rows.contains(7L), s"the 0.79-jaccard near pair is missing: $rows")
    rows.foreach { case (bin, (n, lo, hi)) =>
      assert(n > 0 && lo <= hi)
      assert(lo >= bin / 10.0 - 1e-15 && (bin == 9L || hi < (bin + 1) / 10.0),
        s"observed jaccards must respect bin bounds: $bin -> ($lo, $hi)")
    }
  }

  test("emb_outliers: cosines bounded, ranks ordered, bottom of the corpus") {
    val rows = q("emb_outliers", sfDir).collect()
    assert(rows.length == 20)
    val cs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_centroid"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a <= b },
      "rank order must follow ascending centroid-cosine")
    cs.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    // genuinely the bottom: every reported cosine is below the corpus
    // median cosine-to-centroid (sanity that the sort direction is
    // outliers-first, not nearest-first)
    assert(cs.last < 0.5)
  }

  test("emb_dispersion: per-label cohesion equals the quantized member mean") {
    val rows = q("emb_dispersion", sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.t(spark, sfDir, "embeddings").count())
    rows.foreach { r =>
      val (n, q_, c) = (r.getAs[Long]("n"), r.getAs[Long]("cohesion_q"),
        r.getAs[Double]("cohesion"))
      assert(c == q_.toDouble / 1e12 / n)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("knn_filtered: every hit satisfies the predicate; pre-filter ⊇ none missed") {
    val dir = sfDir
    val labels = Tables.t(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = q("knn_filtered", dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, vid) = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      assert(labels(vid) == labels(qid),
        s"hit $vid must share query $qid's label")
    }
    // pre-filtering: the filtered top-5 must contain every UNFILTERED
    // top-5 member that happens to satisfy the predicate (post-filter
    // of brute would only ever return a subset — equality here proves
    // the filter ran before ranking, not after)
    val brute = q("knn_brute", dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    brute.filter { case (qid, vid) => labels(vid) == labels(qid) }
      .foreach { p => assert(got.contains(p),
        s"same-label brute hit $p missing from filtered result") }
  }

  test("q90_twap: hand-recomputed user matches; twap inside value range") {
    val dir = sfDir
    val evs = Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us", "value")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[Double]("value")))
    val rows = q("q90_twap", dir).collect()
    assert(rows.nonEmpty)
    val uid = rows.head.getAs[Long]("user_id")
    val mine = evs.filter(_._1 == uid).sortBy(e => (e._3, e._2))
    val terms = mine.zip(mine.tail).map { case (a, b) =>
      (math.round(a._4 * 100), b._3 - a._3)
    }
    val expTwap = terms.map { case (vq, d) => vq * d }.sum.toDouble / 100.0 /
      terms.map(_._2).sum.toDouble
    val got = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(got.getAs[Long]("n_intervals") == terms.length)
    assert(got.getAs[Double]("twap") == expTwap)
    rows.foreach { r =>
      val t = r.getAs[Double]("twap")
      assert(!t.isNaN && t >= 0.0, s"twap out of range: $r")
    }
  }

  test("q91_decay_sum: shift semantics — recent events dominate, score bounded") {
    val rows = q("q91_decay_sum", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sq) = (r.getAs[Long]("n_events"), r.getAs[Long]("score_q"))
      assert(n > 0)
      assert(r.getAs[Double]("score") == sq.toDouble / 100.0)
      assert(sq >= 0)
    }
  }

  test("dq_freshness: the freshest feed has zero lag; totals cover the table") {
    val rows = q("dq_freshness", sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("lag_us") == 0L),
      "some feed must define the watermark")
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_us") >= 0L)
      assert(r.getAs[Long]("n_last_hour") <= r.getAs[Long]("n_events"))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.t(spark, sfDir, "events").count())
  }

  test("sample_importance: acceptance follows the quality score") {
    val dir = sfDir
    val kept = q("sample_importance", dir).collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val p = r.getAs[Double]("p_accept")
      val expect = math.min(math.max(0.5 + r.getAs[Double]("score"), 0.1), 0.9)
      assert(p == expect && p >= 0.1 && p <= 0.9)
    }
    // importance sampling must actually bias toward quality: the kept
    // set's mean score exceeds the full corpus mean (deterministic on
    // the pinned corpus)
    val all = q("text_classify", dir).collect()
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(mean(kept.map(_.getAs[Double]("score"))) >
      mean(all.map(_.getAs[Double]("score"))))
    assert(kept.length < all.length, "sampling must actually drop docs")
  }

  test("text_classify separates rule-gated positives on the planted fixture") {
    // Fixture doc 0 (28 words incl. repeated stopwords) trains as a
    // positive; doc 3 (9 words) as a negative. A naive-Bayes log-odds
    // scorer trained on those labels must rank doc 0 above doc 3.
    val byId = q("text_classify", Fixtures.dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byId(0L) > byId(3L),
      s"positive-labeled doc should outscore a negative: $byId")
  }

  test("dedup_semantic equals an independent Scala replay of the keep-rank rule") {
    // Re-derive the dropped set from the raw rank relation with plain
    // Scala loops (same in-order left-fold dot as Vectors.dot, so the
    // doubles compare bit-for-bit), then require the entry to match it
    // EXACTLY — not just invariants.
    val m = SimilarityOps.semanticRank(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("embedding").toArray,
        r.getAs[Double]("cdot"))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val expect = (for {
      (cl, a, ea, ca) <- m
      (cr, b, eb, cb) <- m
      if cl == cr && (ca < cb || (ca == cb && a < b))
      if dot(ea, eb) >= 0.35
    } yield (cl, b)).groupBy(identity).view
      .map { case ((cl, b), hits) => (cl, b, hits.length.toLong) }
      .toSeq.sorted
    val got = q("dedup_semantic", sfDir).collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("n_better"))).toSeq
    assert(expect.nonEmpty, "corpus should plant at least one semantic dup")
    assert(got == expect, s"entry diverged from the replay: " +
      s"got ${got.take(5)}... expect ${expect.take(5)}...")
    // the per-cell rank champion (min cdot, tie min id) must survive
    val dropped = got.map(t => (t._1, t._2)).toSet
    m.groupBy(_._1).foreach { case (cl, members) =>
      val champ = members.minBy(t => (t._4, t._2))._2
      assert(!dropped.contains((cl, champ)),
        s"cell $cl keep-rank champion $champ must never be dropped")
    }
  }

  test("dedup_semantic_incremental: probe-only, history-only partners, within cell") {
    val m = SimilarityOps.semanticRank(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("embedding").toArray)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val expect = (for {
      (cp, p, ep) <- m if p % 10 == 0
      (ch, h, eh) <- m if h % 10 != 0
      if cp == ch
      c = dot(ep, eh) if c >= 0.35
    } yield (p, h, c)).toSeq.sortBy(t => (t._1, t._2))
    val got = q("dedup_semantic_incremental", sfDir).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("cos"))).toSeq
    assert(got == expect, s"incremental diverged: got ${got.take(5)} " +
      s"expect ${expect.take(5)}")
  }

  test("dedup_recall_report: planted exact dup lands in bin 9 with full recall") {
    // Fixture docs 0 and 1 are byte-identical → Jaccard 1.0 (bin 9)
    // and identical MinHash signatures, so ALL 16 bands collide: the
    // top bin must exist and be fully recalled. Identical signatures
    // failing to collide would mean the signature store is broken —
    // exactly what this report exists to catch.
    val rows = q("dedup_recall_report", Fixtures.dir).collect()
    assert(rows.nonEmpty)
    val bins = rows.map(_.getAs[Long]("bin")).toSeq
    assert(bins == bins.sorted && bins.distinct == bins)
    rows.foreach { r =>
      val (n, rec) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_recalled"))
      assert(n >= 1 && rec >= 0 && rec <= n)
      assert(r.getAs[Double]("recall") == rec.toDouble / n.toDouble)
      assert(r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 9)
    }
    val top = rows.find(_.getAs[Long]("bin") == 9L)
    assert(top.isDefined, s"exact-dup pair must populate bin 9: $bins")
    assert(top.get.getAs[Double]("recall") == 1.0,
      "identical signatures must collide in every band")
  }

  test("pq_recall_report: hits equal the recomputed brute∩pq overlap per query") {
    // Cross-check the report against the two retrieval entries it
    // monitors: hits@5 must equal the overlap of knn_brute's and
    // knn_pq's own top-5 sets, query by query.
    val brute = q("knn_brute", sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = q("knn_pq", sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = q("pq_recall_report", sfDir).collect()
    assert(rows.map(_.getAs[Long]("qid")).toSeq == (0L until 10L),
      "every sampled query must report, zero-hit ones included")
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val expect = brute(qid).intersect(pq(qid)).size.toLong
      assert(r.getAs[Long]("hits") == expect,
        s"qid $qid hits ${r.getAs[Long]("hits")} != overlap $expect")
      assert(r.getAs[Double]("recall") == expect.toDouble / 5.0)
    }
  }

  test("stream_semantic_dedup drained == batch dedup_semantic_incremental") {
    val batch = q("dedup_semantic_incremental", sfDir).collect()
      .map(_.toString).toSeq
    val stream = q("stream_semantic_dedup", sfDir).collect()
      .map(_.toString).toSeq
    assert(stream == batch,
      "stream splitting must not change a single confirmed pair")
  }

  test("knn_hard_negatives: every hit is cross-label and equals the filtered brute rank") {
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Vectors.normalized(col("embedding")).as("e"),
        col("label"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Double]]("e").toArray,
        r.getAs[Int]("label")))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val labels = emb.map(t => t._1 -> t._3).toMap
    val expect = emb.filter(_._1 < 10).sortBy(_._1).flatMap {
      case (qid, qe, ql) =>
        emb.filter(t => t._1 != qid && t._3 != ql)
          .map(t => (t._1, dot(t._2, qe)))
          .sortBy { case (id, sim) => (-sim, id) }
          .take(5).zipWithIndex
          .map { case ((id, sim), i) => (qid, i + 1, id, sim) }
    }.toSeq
    val got = q("knn_hard_negatives", sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    assert(got == expect, s"diverged: got ${got.take(3)} expect ${expect.take(3)}")
    got.foreach { case (qid, _, id, _) =>
      assert(labels(id) != labels(qid), "a hard negative must be cross-label")
    }
  }

  test("sample_class_balance: every label kept at exactly the minority count") {
    val all = Tables.t(spark, sfDir, "embeddings")
      .groupBy(col("label")).count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val minN = all.values.min
    val kept = q("sample_class_balance", sfDir).collect()
    val byLabel = kept.groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.length.toLong).toMap
    assert(byLabel.keySet == all.keySet, "every label must survive")
    byLabel.foreach { case (l, n) =>
      assert(n == minN, s"label $l kept $n != minority count $minN")
    }
    // deterministic: a rerun replays the identical membership
    val again = q("sample_class_balance", sfDir).collect()
    assert(kept.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
