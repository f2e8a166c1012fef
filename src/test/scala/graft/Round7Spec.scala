package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: bpe_apply must encode exactly what an
  * independent in-memory BPE (train + greedy merge application)
  * produces on the same corpus.
  */
class Round7Spec extends SparkSuite {

  test("bpe_apply matches an in-memory encode with the trained merge table") {
    import spark.implicits._
    val d = "target/fixtures_bpe7"
    val texts = Seq(
      "low lower lowest low low newer newest wide wider widest",
      "low slow slower newest newest lower low wide",
      "the lowest slowest newest low lower the the",
      "unseen zyzzyva word")
    texts.zipWithIndex.map { case (t2, i) =>
      (i.toLong, t2, "en", s"s$i", t2.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    // in-memory trainer — same algorithm + tie order as Round6Spec's
    val allWords = texts.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
    var vocab: Seq[(Vector[String], Long)] = allWords.groupBy(identity).toSeq
      .map { case (w, g) => (w.map(_.toString).toVector :+ "</w>", g.size.toLong) }
    def applyMerge(seq: Vector[String], a: String, b: String): Vector[String] = {
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
          nb += (a + b); i += 2
        } else { nb += seq(i); i += 1 }
      }
      nb.result()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to 10) {
      val counts = scala.collection.mutable
        .Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((seq, c) <- vocab; i <- 0 until seq.length - 1)
        counts((seq(i), seq(i + 1))) += c
      val ((a, b), _) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      merges += ((a, b))
      vocab = vocab.map { case (seq, c) => (applyMerge(seq, a, b), c) }
    }
    // in-memory ENCODE of each document with the trained table
    val expect = texts.zipWithIndex.map { case (t2, i) =>
      val ws = t2.toLowerCase.split(" ").filter(_.nonEmpty)
      val nToks = ws.map { w =>
        var seq = w.map(_.toString).toVector :+ "</w>"
        for ((a, b) <- merges) seq = applyMerge(seq, a, b)
        seq.length.toLong
      }.sum
      (i.toLong, ws.length.toLong, nToks)
    }

    val got = q("bpe_apply", d).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("windowed deletion variants: recall-1 holds at the window boundary") {
    // The random property test (Round6Spec) covers the bulk; these are
    // the deterministic adversarial shapes of the suffix-window proof
    // — length-shifting edits AT and AROUND the window edge, where the
    // boundary-trim argument does the work.
    import org.apache.spark.unsafe.types.UTF8String
    def variants(s: String): Set[Long] = {
      val arr = graft.functions.ExprKernels
        .delVariants(UTF8String.fromString(s), 2, 12)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val s = "Customer#000004217 xq"  // 21 chars, window = last 12
    val w = s.length - 12
    val cases: Seq[(String, String)] = Seq(
      "substitution before the window" -> s.updated(0, 'Z'),
      "deletion just before the window (w-1)" -> s.patch(w - 1, Nil, 1),
      "deletion of the FIRST window char" -> s.patch(w, Nil, 1),
      "deletion of the LAST char" -> s.patch(s.length - 1, Nil, 1),
      "insertion at the window front edge" -> s.patch(w, Seq('Q'), 0),
      "two deletions at both window ends" ->
        s.patch(w, Nil, 1).patch(s.length - 2, Nil, 1),
      "substitution at boundary + deletion outside" ->
        s.updated(w, 'Z').patch(0, Nil, 1),
      "multi-byte substitution at the boundary" -> s.updated(w, 'é'),
      "deletion + multi-byte insertion inside window" ->
        s.patch(s.length - 3, Nil, 1).patch(s.length - 6, Seq('ü'), 0))
    cases.foreach { case (label, t2) =>
      assert(variants(s).intersect(variants(t2)).nonEmpty,
        s"no shared variant for: $label ('$s' vs '$t2')")
    }
  }

  test("emb_quantize: int8 codes bound the reconstruction error by half a step") {
    // |x·s − q| ≤ 1/2 by construction, so |x − q/s| ≤ 1/(2s); codes
    // stay in the int8 envelope and q_sum is a faithful checksum of a
    // hand-quantized row.
    val rows = q("emb_quantize", sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val maxErr = r.getAs[Double]("max_err")
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127,
        s"vec ${r.getAs[Long]("vec_id")} outside int8 envelope")
      assert(maxErr <= 0.5 / scale + 1e-12,
        s"vec ${r.getAs[Long]("vec_id")}: err $maxErr > half-step ${0.5 / scale}")
    }
    // hand-check one vector end-to-end
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .collect()(0).getAs[scala.collection.Seq[Float]]("embedding")
    val mx = emb.map(x => math.abs(x.toDouble)).max
    val s0 = if (mx > 0) 127.0 / mx else 1.0
    val qs = emb.map(x => math.floor(x.toDouble * s0 + 0.5).toLong).sum
    val row0 = rows.find(_.getAs[Long]("vec_id") == 0L).get
    assert(row0.getAs[Double]("scale") == s0)
    assert(row0.getAs[Long]("q_sum") == qs)
  }
}
