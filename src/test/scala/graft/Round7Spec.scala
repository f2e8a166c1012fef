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
}
