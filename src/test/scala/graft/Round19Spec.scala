package graft

import org.apache.spark.storage.StorageLevel

/** A MediaCodec that delegates every kernel to the stub — the
  * "stub-vs-stub" wiring control: installing it must change nothing.
  * Top-level (not nested in the spec) so the task closure serializes
  * without dragging the ScalaTest suite along.
  */
object DelegatingTestCodec extends MediaCodec {
  def decode(r: MultimodalOps.MMIn) = StubMediaCodec.decode(r)
  def phash(r: MultimodalOps.MMIn) = StubMediaCodec.phash(r)
  def resize(r: MultimodalOps.MMIn) = StubMediaCodec.resize(r)
  def frames(r: MultimodalOps.MMIn) = StubMediaCodec.frames(r)
  def embed(r: MultimodalOps.MMIn) = StubMediaCodec.embed(r)
}

/** A visibly different codec (checksum + 1) proving the mm_* entries
  * actually route through whatever is installed.
  */
object MarkedTestCodec extends MediaCodec {
  def decode(r: MultimodalOps.MMIn) = {
    val f = StubMediaCodec.decode(r)
    f.copy(checksum = f.checksum + 1)
  }
  def phash(r: MultimodalOps.MMIn) = StubMediaCodec.phash(r)
  def resize(r: MultimodalOps.MMIn) = StubMediaCodec.resize(r)
  def frames(r: MultimodalOps.MMIn) = StubMediaCodec.frames(r)
  def embed(r: MultimodalOps.MMIn) = StubMediaCodec.embed(r)
}

/** Round-19 wave (ADVICE r18 + VERDICT r18): index-cache eviction
  * must not stall on zero-tracked-byte corpora, the diagnostic mains
  * must not eat a flag's value as a corpus dir, the knn_hybrid
  * query-term cap gets its truncation contract pinned, and the mm_*
  * codec seam gets its wiring test.
  */
class Round19Spec extends SparkSuite {

  test("MediaCodec seam: drop-in codec without touching the plumbing") {
    def meta() = SparkEntry.queries("mm_meta")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("checksum"))).sortBy(_._1).toSeq
    val stub = meta()
    assert(stub.nonEmpty)
    // scoped swaps (ADVICE r19): withCodec holds the codec lock for
    // the whole region, so a concurrently-building mm_* plan in any
    // other suite blocks on the codec read instead of silently
    // capturing the test codec
    MultimodalOps.withCodec(DelegatingTestCodec) {
      // stub-vs-stub: a delegating implementation is invisible
      assert(meta() == stub,
        "a codec delegating to the stub must produce identical output")
    }
    MultimodalOps.withCodec(MarkedTestCodec) {
      // and the plumbing really routes through what's installed
      assert(meta() == stub.map { case (id, c) => (id, c + 1) },
        "an installed codec must be what the entry executes")
    }
    assert(meta() == stub, "leaving the scope must restore the output")
  }

  test("IndexCache: eviction continues past a zero-tracked-byte LRU corpus") {
    val s = spark
    Seq("zeroC", "bigC", "curC").foreach(IndexCache.evictCorpus(s, _))
    s.conf.unset(IndexCache.BudgetConf)
    try {
      // oldest corpus tracks 0 bytes (driver artifact), next one holds
      // a materialized cached Dataset — the early-return bug evicted
      // only the 0-byte LRU and deferred the real reclamation
      IndexCache.getOrBuild(s, "zeroC", "weights")(Array(1L, 2L, 3L))
      val big = IndexCache.getOrBuild(s, "bigC", "art")(
        s.range(50000).toDF("n").persist())
      big.count()
      // re-touch so the now-materialized bytes get probed (per-touch
      // accounting); zeroC stays the LRU corpus
      IndexCache.getOrBuild(s, "bigC", "art")(
        fail("re-touch must hit the cache"))
      s.conf.set(IndexCache.BudgetConf, "1")
      IndexCache.getOrBuild(s, "curC", "art")(Array(9L))
      val left = IndexCache.stats(s).map(_.corpus).toSet
      assert(!left.contains("zeroC"), "0-byte LRU corpus must be evicted")
      assert(!left.contains("bigC"),
        "eviction must continue past the 0-byte corpus to the one " +
          s"actually holding bytes; still cached: $left")
      assert(left.contains("curC"), "just-touched corpus must survive")
      assert(big.storageLevel == StorageLevel.NONE,
        "the big artifact must actually be unpersisted")
    } finally {
      s.conf.unset(IndexCache.BudgetConf)
      Seq("zeroC", "bigC", "curC").foreach(IndexCache.evictCorpus(s, _))
    }
  }

  test("knn_hybrid: >1024-term query truncates deterministically " +
      "(top idf, term-asc tiebreak; dropped terms invisible)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1023 high-idf terms fill ranks 1..1023; two EQUAL-idf terms
    // contend for the single remaining slot — the term-asc tiebreak
    // must keep "tiea" (rank 1024) and drop "tieb" (rank 1025)
    val hTerms = (1 to 1023).map(i => f"h$i%04d")
    val terms = hTerms ++ Seq("tiea", "tieb")
    val idfTbl = (hTerms.zipWithIndex.map { case (t, i) =>
        (t, 10000L + i) } ++ Seq(("tiea", 2L), ("tieb", 2L)))
      .toDF("term", "idf_q")
    val docs = Seq(
      (0L, terms.mkString(" ")), // the 1025-term query doc
      (10L, "tiea zz"),          // shares only the KEPT boundary term
      (11L, "tieb zz")           // shares only the DROPPED term
    ).toDF("doc_id", "text")
    val tok = terms.map(t => (0L, t)).toDF("doc_id", "term")
    val ids = SimilarityOps.hybridLexTop(docs, tok, idfTbl)
      .filter(col("qid") === 0L).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(ids.contains(10L),
      "a doc sharing the kept rank-1024 term must be scored")
    assert(!ids.contains(11L),
      "a doc sharing only the dropped rank-1025 term must not surface " +
        "(truncation recall semantics: dropped terms contribute nothing)")
  }

  test("timer sessions: resident state still tracks OPEN sessions " +
      "across a 3x longer drain (12 watermark ratchets)") {
    import org.apache.spark.sql.functions._
    // Round17Spec pins exact per-batch residency for the entry's
    // 4-bucket drain; VERDICT r18 #5 asks for the PLATEAU under a 3x
    // longer drain — same corpus, 12 ratchets. If eviction tracked
    // batches instead of open sessions, tripling the batch count
    // would shift residency; the exact per-batch equality below says
    // it tracks the watermark alone. (SessPlateau is the sf10-scale
    // measured twin of this test.)
    val K = 12
    val root = StreamOps.timerSessPrep(spark, sfDir, K)
    val (closed, ckptOpt) =
      StreamOps.timerSessStream(spark, root, checkpointed = true)
    assert(closed.count() > 0)
    val ckpt = ckptOpt.get

    val gap = StreamOps.TimerSessGapUs
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val Array(lo, hi) = ev.agg(min(col("us")), max(col("us")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val span = hi - lo + 1
    val totalUsers = ev.select(col("user_id")).distinct().count()

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
    def fileHi(i: Int): Long = lo + span * (i + 1) / K
    def fileMax(i: Int): Long =
      ev.filter(col("us") < lit(fileHi(i))).agg(max(col("us")))
        .head().getLong(0)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val commits = new java.io.File(s"$ckpt/commits").list()
        .filter(_.forall(_.isDigit)).map(_.toLong).sorted
      assert(commits.length >= K,
        s"expected >=$K committed batches, got ${commits.mkString(",")}")
      var finalRows = 0L
      commits.foreach { b =>
        val rows = StreamOps.timerOpenState(spark, ckpt, Some(b)).count()
        val dataIdx = math.min(b, (K - 1).toLong).toInt
        val wm = if (b == 0) None
          else Some(fileMax(math.min(b - 1, (K - 1).toLong).toInt))
        val exp = expectedOpen(fileHi(dataIdx), wm)
        assert(rows == exp,
          s"batch $b: resident state $rows != expected open $exp")
        finalRows = rows
      }
      // the bounding claim: closed sessions LEFT the store under the
      // longer drain too (batch 0 legitimately holds every user seen
      // — no watermark has ratcheted yet — so the plateau is the
      // per-batch equality above plus history leaving by the end)
      assert(finalRows < totalUsers,
        s"final resident $finalRows did not drop below $totalUsers users")
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  test("q71_fuzzy_match: inline-verify variant ≡ shipped shape") {
    // VERDICT r18 #2 A/B: the inline variant moves the banded-lev
    // verify INSIDE the blocking join (before dedup) and drops the
    // name-lookup joins — same candidates, same verify, so the output
    // must be row-identical to the shipped formulation (the sf0.01
    // DuckDB quadratic oracle checks both independently). The variant
    // measured SLOWER at scale (SURVEY §21) and ships behind the
    // flag; equality stays pinned so the ledger entry is re-runnable.
    val a = Analytics4.q71FuzzyMatch(spark, sfDir)
    val b = Analytics4.q71FuzzyMatch(spark, sfDir, inlineVerify = true)
    assert(a.count() > 0, "fixture must produce fuzzy pairs")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "inline-verify output must equal the shipped formulation")
  }

  test("DiagArgs: value-taking flags do not leak their value into dirs") {
    assert(DiagArgs.dirs(Array("d1", "--reps", "5", "d2"), "def") ==
      Seq("d1", "d2"))
    assert(DiagArgs.dirs(Array("--reps", "5"), "def") == Seq("def"))
    assert(DiagArgs.dirs(Array("--sortagg", "d1", "--parts", "64"),
      "def") == Seq("d1"))
    assert(DiagArgs.dirs(Array.empty[String], "def") == Seq("def"))
    assert(DiagArgs.intFlag(Array("--reps", "5"), "--reps").contains(5))
    assert(DiagArgs.intFlag(Array("d"), "--reps").isEmpty)
    // ADVICE r19: SessPlateau's --buckets landed without a ValueFlags
    // entry, so its value parsed as a corpus dir and the run crashed
    // reading tables from dir "24"
    assert(DiagArgs.dirs(Array("target/sf10", "--buckets", "24"), "def") ==
      Seq("target/sf10"))
    assert(DiagArgs.intFlag(Array("--buckets", "24"), "--buckets")
      .contains(24))
    // a non-integer value fails loud, naming the flag (not a bare
    // NumberFormatException that dirs() silently disagrees with)
    val e = intercept[RuntimeException](
      DiagArgs.intFlag(Array("--reps", "foo"), "--reps"))
    assert(e.getMessage.contains("--reps") &&
      e.getMessage.contains("foo"))
    // an UNREGISTERED flag string can't be queried at all — the
    // require turns the add-a-flag-forget-the-set bug class into an
    // immediate failure at the new call site
    intercept[IllegalArgumentException](
      DiagArgs.intFlag(Array("--novel", "3"), "--novel"))
  }
}
