package graft

import org.apache.spark.sql.functions._

/** Edge-case goldens for TextOps.canonicalizeUrl — the web-corpus
  * dedup key must behave predictably off the planted happy path.
  */
class UrlCanonSpec extends SparkSuite {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().toSeq.map(_.getString(0))
  }

  test("default ports drop; non-default and scheme-mismatched ports stay") {
    assert(canon(
      "https://a.com:443/x", "http://a.com:80/x",
      "https://a.com:8443/x", "http://a.com:443/x") == Seq(
      "https://a.com/x", "http://a.com/x",
      "https://a.com:8443/x", "http://a.com:443/x"))
  }

  test("no port, no query, no fragment is already canonical") {
    assert(canon("https://a.com/x") == Seq("https://a.com/x"))
  }

  test("scheme and host lowercase; path case preserved; www stripped") {
    assert(canon("HTTP://WWW.A.COM/Path/File") == Seq("http://a.com/Path/File"))
  }

  test("an all-tracking query drops its '?' entirely") {
    assert(canon("https://a.com/x?utm_source=a&utm_medium=b") ==
      Seq("https://a.com/x"))
  }

  test("tracking params drop from any position; real params keep order") {
    assert(canon(
      "https://a.com/x?utm_source=a&id=1&q=2",
      "https://a.com/x?id=1&utm_source=a&q=2",
      "https://a.com/x?id=1&q=2&utm_source=a") == Seq(
      "https://a.com/x?id=1&q=2",
      "https://a.com/x?id=1&q=2",
      "https://a.com/x?id=1&q=2"))
  }

  test("a param NAME merely containing utm_ survives the strip") {
    // regression: the unanchored strip spliced '?myutm_x=1&id=2' into
    // '?myid=2', corrupting the adjacent param
    assert(canon(
      "https://a.com/x?myutm_x=1&id=2",
      "https://a.com/x?id=2&myutm_x=1",
      "https://a.com/x?utm_a=1&myutm_x=1&utm_b=2") == Seq(
      "https://a.com/x?myutm_x=1&id=2",
      "https://a.com/x?id=2&myutm_x=1",
      "https://a.com/x?myutm_x=1"))
  }

  test("one dot-segment level resolves; fragments always drop") {
    assert(canon("https://a.com/a/b/../c#sec") == Seq("https://a.com/a/c"))
  }
}
