package graft

import org.apache.spark.sql.functions._

/** Round-13 wave: cross-engine edge guards for short/empty documents
  * (ADVICE r12). The sf corpora are all >= 3 words per doc, so the
  * driver's hash gate can't see these paths — this spec feeds a micro
  * corpus that exercises them directly and pins the agreed semantics:
  * docs under the window size contribute NOTHING (no partial shingle,
  * no empty line) on either engine.
  */
class Round13Spec extends SparkSuite {

  /** Write a documents table with the sf schema into a temp dir. */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r13").toString
    rows.map { case (id, text, source) =>
      (id, text, "en", source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("corpus_overlap: docs under 3 tokens yield no shingles, not a partial one") {
    // srcA and srcB share their only full 3-shingle; srcB's extra
    // 2-token and empty docs must contribute nothing (the unguarded
    // concat_ws emitted a partial 'a b' shingle, inflating n_b)
    val dir = corpus(Seq(
      (1L, "a b c", "srcA"),
      (2L, "a b c", "srcB"),
      (3L, "a b", "srcB"),
      (4L, "", "srcB"),
      (5L, "x", "srcB")))
    val rows = q("corpus_overlap", dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_a") == 1L, s"srcA shingles: $r")
    assert(r.getAs[Long]("n_b") == 1L,
      s"short docs leaked partial shingles: $r")
    assert(r.getAs[Long]("n_shared") == 1L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("dedup_lines: empty docs emit zero lines and vanish; short docs keep one line") {
    val dir = corpus(Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11", "s"), // 2 lines
      (2L, "solo", "s"), // 1 line of 1 word
      (3L, "", "s"), // no tokens -> absent (DuckDB floor-division twin)
      (4L, "   ", "s"))) // whitespace-only -> absent
    val rows = q("dedup_lines", dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet == Set(1L, 2L),
      s"empty docs must be absent: ${byId.keySet}")
    assert(byId(1L).getAs[Long]("n_lines") == 2L)
    assert(byId(2L).getAs[Long]("n_lines") == 1L)
    // nothing is boiler in a df<3 micro corpus; kept text is intact
    assert(rows.forall(_.getAs[Long]("n_boiler") == 0L))
  }
}
