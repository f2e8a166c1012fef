package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DatasetBridge

import graft.functions.LevenshteinBand

/** The banded Levenshtein contract: exact distance when <= k, capped
  * at k+1 beyond — so `band <= k` filters identically to
  * `levenshtein <= k` and kept rows carry identical distances. Run
  * with codegen fallback DISABLED so the generated path is what's
  * proven.
  */
class LevBandSpec extends SparkSuite {

  private def noFallback[T](f: => T): T = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  test("band(k=2) == min(levenshtein, 3) on edit-distance edge cases") {
    import spark.implicits._
    val pairs = Seq(
      ("", ""), ("", "ab"), ("", "abc"),
      ("kitten", "kitten"),          // 0
      ("kitten", "sitten"),          // 1 sub
      ("kitten", "kitte"),           // 1 del
      ("kitten", "kittens"),         // 1 ins
      ("kitten", "sitting"),         // 3
      ("flaw", "lawn"),              // 2
      ("abcdef", "abcfed"),          // 2 (swap-ish)
      ("abcdefgh", "abdcefhg"),      // transpositions cost 2 each
      ("Customer#000000001", "Customer#000000010"),
      ("Customer#000000001", "Customer#000000991"),
      ("Customer#000000001", "Xustomer#999999999"),
      ("short", "a much longer string entirely"),
      ("ab", "ba"), ("abc", "xyz"))
    val df = pairs.toDF("a", "b")
    val out = noFallback {
      df.select(col("a"), col("b"),
          levenshtein(col("a"), col("b")).as("full"),
          DatasetBridge.column(LevenshteinBand(
            DatasetBridge.expression(col("a")),
            DatasetBridge.expression(col("b")), 2)).as("band"))
        .collect()
    }
    out.foreach { r =>
      val (full, band) = (r.getInt(2), r.getInt(3))
      assert(band == math.min(full, 3),
        s"${r.getString(0)} / ${r.getString(1)}: full=$full band=$band")
    }
  }

  test("band is symmetric and null-propagating") {
    import spark.implicits._
    val df = Seq((Some("abc"), Some("abd")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    def band(x: String, y: String) = DatasetBridge.column(LevenshteinBand(
      DatasetBridge.expression(col(x)), DatasetBridge.expression(col(y)), 2))
    val rows = noFallback {
      df.select(band("a", "b").as("ab"), band("b", "a").as("ba")).collect()
    }
    assert(rows(0).getInt(0) == 1 && rows(0).getInt(1) == 1)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("band(k) filter selects the same rows as full levenshtein for every k") {
    import spark.implicits._
    val words = Seq("graft", "craft", "draft", "grate", "gravity",
      "spark", "shark", "sharp", "harp", "graphs")
    val df = words.flatMap(a => words.map(b => (a, b))).toDF("a", "b")
    for (k <- 0 to 4) {
      val full = df.filter(levenshtein(col("a"), col("b")) <= k).count()
      val band = noFallback {
        df.filter(DatasetBridge.column(LevenshteinBand(
          DatasetBridge.expression(col("a")),
          DatasetBridge.expression(col("b")), k)) <= k).count()
      }
      assert(full == band, s"k=$k: full=$full band=$band")
    }
  }
}
