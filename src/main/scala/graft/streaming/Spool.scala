package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Unified2

/** Structured-streaming unified2 spool ingestion — the reference's
  * per-spool follower processes + bookmark files
  * (/root/reference/charlotte/__init__.py:213-283,108-120) collapse to
  * a Spark file-stream source: new `snort.log.*` files are discovered
  * per micro-batch (rollover handling), and the streaming checkpoint IS
  * the bookmark — an `AvailableNow` restart resumes exactly after the
  * last processed file, no custom offset tracking.
  */
object Spool {

  /** binaryFile source schema (fixed by Spark). */
  private val binSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming record feed for one sensor spool (N directories). */
  def streamRecords(spark: SparkSession, dirs: Seq[String], prefix: String,
      sensor: String): DataFrame = {
    import spark.implicits._
    val streams = dirs.map { d =>
      spark.readStream.format("binaryFile")
        .option("pathGlobFilter", s"$prefix*")
        .schema(binSchema)
        .load(d)
        .select(col("path"), col("content"))
    }
    val unioned = streams.reduce(_ unionByName _)
    unioned.as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => Unified2.parseFile(path, bytes) }
      .toDF()
      .withColumn("sensor", lit(sensor))
  }
}
