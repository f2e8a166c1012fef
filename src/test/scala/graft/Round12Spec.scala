package graft

import org.apache.spark.sql.functions._

/** Round-12 wave: URL-keyed dedup, line-level boilerplate dedup,
  * Bloom-gated ingest decontamination, cross-source overlap, and
  * random-projection dimensionality reduction. Each test checks the
  * SEMANTICS the DuckDB hash-compare can't see (keep-rule optimality,
  * sketch-free equivalence, reassembly identity, bit-exact kernel
  * replication).
  */
class Round12Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("dedup_url keeps the max-chars min-id doc per canonical key and drops all variant noise") {
    val rows = q("dedup_url", dir).collect()
    assert(rows.length == 97) // doc_id % 97 canonical pages over 500 docs
    // canonicalization stripped scheme case, www, default port, utm
    // query and fragment from EVERY surviving key
    rows.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(u.matches("""https://site\d+\.com/p"""), u)
    }
    assert(rows.map(_.getAs[Long]("n_copies")).sum == 500)
    // keep rule: no other doc in the group beats (n_chars desc, id asc)
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        (col("doc_id") % 97).as("gid")).collect()
      .groupBy(_.getAs[Long]("gid"))
    rows.foreach { r =>
      val gid = r.getAs[String]("canon_url")
        .stripPrefix("https://site").stripSuffix(".com/p").toLong
      val best = docs(gid).minBy(d =>
        (-d.getAs[Long]("n_chars"), d.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("keep_id") == best.getAs[Long]("doc_id"),
        s"group $gid kept ${r.getAs[Long]("keep_id")}")
    }
  }

  test("dedup_lines: kept text of a boiler-free doc is the whole doc; boiler docs lose exactly their shared lines") {
    val rows = q("dedup_lines", dir).collect()
    assert(rows.length == 500)
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0),
      "corpus has df>=3 lines; none flagged")
    // boiler-free docs: kept_sha == sha of the full space-joined tokens
    val full = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        sha2(array_join(filter(split(col("text"), " "),
          x => length(x) > lit(0)), " "), 256).as("full_sha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clean = rows.filter(_.getAs[Long]("n_boiler") == 0)
    assert(clean.nonEmpty)
    clean.foreach(r => assert(
      r.getAs[String]("kept_sha") == full(r.getAs[Long]("doc_id")),
      s"doc ${r.getAs[Long]("doc_id")}: boiler-free text changed"))
    // flagged docs must NOT equal their full text
    rows.filter(_.getAs[Long]("n_boiler") > 0).foreach(r => assert(
      r.getAs[String]("kept_sha") != full(r.getAs[Long]("doc_id"))))
  }

  test("dedup_incremental_bloom equals the sketch-free gram join and probes natively") {
    val got = q("dedup_incremental_bloom", dir)
    // plan: native might_contain probe, no Scala UDF boundary
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing")
    assert(!plan.toLowerCase.contains("scalaudf"), "UDF snuck in")
    // the bloom is a PRE-filter: result must equal the plain join
    val toks = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "),
          x => length(x) > lit(0)).as("tk"))
    val grams = toks.select(col("doc_id"),
      explode(when(size(col("tk")) >= 6,
        transform(sequence(lit(1), size(col("tk")) - lit(5)),
          i => array_join(slice(col("tk"), i, lit(6)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val hist = grams.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("hist_doc"), col("gram")).distinct()
    val want = grams.filter(col("doc_id") % 10 === 0)
      .join(hist, "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"),
        countDistinct(col("hist_doc")).as("n_hist_docs"))
      .orderBy(col("doc_id")).collect()
    assert(got.collect().toSeq == want.toSeq)
    assert(want.nonEmpty)
  }

  test("corpus_overlap: full pair matrix with exact set algebra") {
    val rows = q("corpus_overlap", dir).collect()
    assert(rows.length == 190) // C(20, 2) source pairs
    rows.foreach { r =>
      val (na, nb, ix) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_shared"))
      assert(ix >= 1 && ix <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j == ix.toDouble / (na + nb - ix).toDouble)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    // spot-recompute one pair's intersection independently (docs are
    // >= 3 words, so the entry's shingles are exactly the full
    // 3-word sliding windows)
    def shingles(src: String): Set[String] = Tables.t(spark, dir, "documents")
      .filter(col("source") === src).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")))
      .toSet
    val a = shingles("src0"); val b = shingles("src1")
    val row01 = rows.find(r => r.getAs[String]("source_a") == "src0" &&
      r.getAs[String]("source_b") == "src1").get
    assert(row01.getAs[Long]("n_shared") == (a intersect b).size)
    assert(row01.getAs[Long]("n_a") == a.size)
    assert(row01.getAs[Long]("n_b") == b.size)
  }

  test("emb_project replicates the kernel bit-exactly and genuinely mixes dimensions") {
    val rows = q("emb_project", dir).collect()
    assert(rows.length == 500)
    // bit-exact Scala replication for the first vectors
    val vecs = Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sign(i: Int, j: Int): Double = {
      val k = i.toLong * 8 + j + 1
      1.0 - 2.0 * ((k * k * 2654435761L / 65536) % 2)
    }
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    vecs.foreach { case (id, v) =>
      (0 until 8).foreach { j =>
        var acc = 0.0
        v.indices.foreach(i => acc += v(i).toDouble * sign(i, j))
        assert(byId(id).getAs[Double](s"p$j") == acc,
          s"vec $id p$j: ${byId(id).getAs[Double](s"p$j")} vs $acc")
      }
    }
    // mixing: no two projected coordinates may be identical columns
    (0 until 8).combinations(2).foreach { case Seq(a, b) =>
      assert(rows.exists(r =>
        r.getAs[Double](s"p$a") != r.getAs[Double](s"p$b")),
        s"p$a == p$b everywhere — degenerate sign matrix")
    }
  }
}
