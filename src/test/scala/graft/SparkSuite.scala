package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def q(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  val sfDir = "/root/testdata/sf0.001"
}

/** Planted-fixture tables written once per JVM under target/fixtures:
  * documents with exact + near duplicates, embeddings with a planted
  * near-identical pair — so dedup/similarity specs assert exact
  * expected pairs instead of only invariants.
  */
object Fixtures {
  val baseText: String =
    "the quick brown fox jumps over the lazy dog near the old river bank today " +
      "while birds sing softly above the tall green trees and wind moves slowly"

  lazy val dir: String = {
    val d = "target/fixtures"
    val spark = SparkSession.getActiveSession.getOrElse(
      SparkSession.builder().master("local[4]").getOrCreate())
    import spark.implicits._

    val base = baseText
    val near = baseText.replace("lazy dog", "lazy cat")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong), // exact dup of 0
      (2L, near, "en", "src2", near.length.toLong), // near dup of 0
      (3L, "completely different words about spark query planning and shuffles", "en", "src3", 66L),
      (4L, "der hund lief schnell durch den park und sprang ins wasser", "de", "src4", 58L),
      (5L, "numbers one two three four five six seven eight nine ten eleven", "en", "src5", 63L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val rng = new scala.util.Random(7)
    def randVec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val v0 = randVec()
    val v1 = v0.map(x => x + 0.01f) // near-identical to v0
    val vecs = (Seq((0L, v0, 0), (1L, v1, 0)) ++
      (2L to 11L).map(i => (i, randVec(), i.toInt % 3)))
      .toDF("vec_id", "embedding", "label")
    vecs.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }
}
