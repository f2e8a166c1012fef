package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Real-codec decode throughput (VERDICT r19 #8): the MB/s number the
  * multimodal family gets now that a REAL codec sits behind the seam,
  * the way u2_bulk_ingest has one. Separates the two halves of
  * mm_phash_real's wall: the PNG corpus is MATERIALIZED first (encode
  * paid untimed, like any crawled corpus already on disk), then the
  * timed pass is decode + block-mean hash over genuine PNG payloads —
  * min-of-3, one scan, no shuffle (the phash kernel's cost IS the
  * measurement; the LSH pairing is mm_phash's separately-pinned half).
  *
  * Usage: runMain graft.MmDecodeDiag target/sf10 [--reps 3]
  */
object MmDecodeDiag {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10")
    val reps = DiagArgs.intFlag(args, "--reps").getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import MultimodalOps.{MMHash, MMIn}

    dirs.foreach { dir =>
      val store = "target/graft_scratch/mm_png_" +
        OracleDumps.scratchSlug(dir) + "_" +
        spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      // encode once, untimed — the on-disk PNG corpus a real pipeline
      // starts from
      MultimodalOps.mmPngSource(spark, dir)
        .write.mode("overwrite").parquet(store)
      val png = spark.read.parquet(store)
      val (nImg, totBytes) = {
        val r = png.agg(count(lit(1)), sum(length(col("payload")))).head()
        (r.getLong(0), r.getLong(1))
      }
      var best = Double.MaxValue
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        png.as(Encoders.product[MMIn])
          .mapPartitions(it => it.map(ImageIoCodec.phash))(
            Encoders.product[MMHash])
          .count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"MMDECODE dir=$dir images=$nImg bytes=$totBytes " +
        f"wall=$best%.2fs imgps=${nImg / best}%.0f " +
        f"mbps=${totBytes / 1e6 / best}%.1f")
    }
    spark.stop()
  }
}
