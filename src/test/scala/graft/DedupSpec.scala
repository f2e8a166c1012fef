package graft

import org.apache.spark.sql.Row

class DedupSpec extends SparkSuite {

  test("dedup_exact groups exact duplicates, keeps min doc_id") {
    val rows = q("dedup_exact", Fixtures.dir).collect()
    assert(rows.length == 5) // 6 docs, one exact-dup pair
    val dupGroup = rows.filter(_.getAs[Long]("n_copies") > 1)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
    assert(dupGroup.head.getAs[Long]("n_copies") == 2L)
  }

  test("dedup_minhash finds exact and near duplicate pairs") {
    val pairs = q("dedup_minhash", Fixtures.dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair missed")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "near dup pair missed")
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
      "false positive pair among distinct docs")
  }

  test("dedup_minhash jaccard values are exact") {
    val rows = q("dedup_minhash", Fixtures.dir).collect()
    val j01 = rows.find(r => r.getAs[Long]("a") == 0L &&
      r.getAs[Long]("b") == 1L).get.getAs[Double]("jaccard")
    assert(j01 == 1.0)
    val j02 = rows.find(r => r.getAs[Long]("a") == 0L &&
      r.getAs[Long]("b") == 2L).get.getAs[Double]("jaccard")
    // one word differs -> 3 of the 26 distinct 3-shingles change;
    // |A ∩ B| = 23, |A ∪ B| = 29
    assert(math.abs(j02 - 23.0 / 29.0) < 1e-12, s"got $j02")
  }

  test("dedup_incremental finds the planted cross-split dups via the persisted store") {
    // split doc_id % 10 == 0 -> new batch = {0}; history = {1..5};
    // planted: 1 is an exact dup of 0, 2 a near dup of 0
    val rows = q("dedup_incremental", Fixtures.dir).collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L)), s"got $pairs")
    val j1 = rows.find(_.getAs[Long]("dup_of") == 1L).get
      .getAs[Double]("jaccard")
    assert(j1 == 1.0, "exact dup must verify at jaccard 1.0")
    // the full-corpus pair set restricted to cross-split pairs must
    // agree with the incremental result (same bands, same verify)
    val full = q("dedup_minhash", Fixtures.dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val cross = full.collect {
      case (a, b) if (a % 10 == 0) != (b % 10 == 0) =>
        if (a % 10 == 0) (a, b) else (b, a)
    }.toSet
    assert(pairs == cross)
  }

  test("dedup_simhash finds the exact dup with hamming 0") {
    val rows = q("dedup_simhash", Fixtures.dir).collect()
    val h01 = rows.find(r => r.getAs[Long]("a") == 0L &&
      r.getAs[Long]("b") == 1L)
    assert(h01.isDefined, "exact dup pair missed by simhash")
    assert(h01.get.getAs[Int]("hamming") == 0)
  }

  test("dedup_ngram_jaccard finds prefix-sharing near dups only") {
    val pairs = q("dedup_ngram_jaccard", Fixtures.dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs((0L, 1L)) && pairs((0L, 2L)) && pairs((1L, 2L)))
    assert(!pairs.exists(p => p._2 >= 3L))
  }

  test("dedup_embedding finds the planted near-identical vector pair") {
    val rows = q("dedup_embedding", Fixtures.dir).collect()
    val p01 = rows.find(r => r.getAs[Long]("a") == 0L &&
      r.getAs[Long]("b") == 1L)
    assert(p01.isDefined, "planted high-cosine pair missed")
    assert(p01.get.getAs[Double]("cos") > 0.99)
  }

  test("dedup ops return rows on real data") {
    assert(q("dedup_exact", sfDir).count() > 0)
    assert(q("dedup_minhash", sfDir).count() >= 0) // no planted dups at sf0.001
    assert(q("dedup_embedding", sfDir).count() > 0)
  }
}
