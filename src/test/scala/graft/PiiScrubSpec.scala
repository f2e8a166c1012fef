package graft

/** Golden checks for text_pii_scrub on the planted fixture corpus:
  * the doc_id-derived contact line must be fully redacted (email,
  * phone, IPv4 — in that order), the surrounding prose untouched,
  * and the per-kind counters exact.
  */
class PiiScrubSpec extends SparkSuite {

  test("planted PII is redacted exactly; prose is untouched") {
    val rows = q("text_pii_scrub", Fixtures.dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val clean0 = byId(0L).getAs[String]("clean_text")
    assert(clean0 ==
      Fixtures.baseText + " contact: <EMAIL> or <PHONE> host <IP>",
      clean0)
    // doc 5's text contains number WORDS ("one two three") — words are
    // not digits, so nothing in the prose may be scrubbed
    val clean5 = byId(5L).getAs[String]("clean_text")
    assert(clean5.startsWith("numbers one two three four five"), clean5)
    assert(clean5.endsWith(" contact: <EMAIL> or <PHONE> host <IP>"))
  }

  test("per-kind counters are exactly one per planted contact line") {
    q("text_pii_scrub", Fixtures.dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_email") == 1L, r.toString)
      assert(r.getAs[Long]("n_phone") == 1L, r.toString)
      assert(r.getAs[Long]("n_ip") == 1L, r.toString)
    }
  }

  test("quality filter: planted docs split on word count and stopwords") {
    val rows = q("text_quality_filter", Fixtures.dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // base text: 25 words -> fails the >=30 gate
    assert(!byId(0L).getAs[Boolean]("ok_n_words"))
    assert(!byId(0L).getAs[Boolean]("keep"))
    // doc 5 ("numbers one two ... eleven"): no stopwords at all
    assert(!byId(5L).getAs[Boolean]("ok_stop_ratio"))
    // every doc here has sane word lengths
    rows.foreach(r => assert(r.getAs[Boolean]("ok_max_word_len")))
  }
}
