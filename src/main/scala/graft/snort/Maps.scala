package graft.snort

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snort rule-map parsers: sid-msg.map, gen-msg.map,
  * classification.config → small DataFrames meant to be BROADCAST
  * against the alert stream (the reference loads them into in-process
  * dicts and mtime-polls for changes, /root/reference/charlotte/
  * __init__.py:155-211; the Spark-native equivalent of "hot reload" is
  * re-reading them per micro-batch — they are KBs, the cost is nil).
  *
  * Files are read driver-side (they are tiny config files, not data)
  * and shipped as literal rows; every join against them is a broadcast
  * join — zero shuffle on the 100 TB side.
  */
object Maps {

  private def lines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))

  // Char.isDigit accepts Unicode digits and forall holds vacuously on
  // "", both of which then throw in toLong — a malformed map line must
  // be SKIPPED (matching the oracle's '[0-9]+' guard), never crash.
  private def asciiDigits(s: String): Boolean =
    s.nonEmpty && s.forall(c => c >= '0' && c <= '9')

  /** sid-msg.map: `sid || msg [|| ref]*` (gid implicitly 1). */
  def sigMap(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    lines(path).flatMap { l =>
      val parts = l.split("\\|\\|").map(_.trim)
      if (parts.length >= 2 && asciiDigits(parts(0)))
        Some((1L, parts(0).toLong, parts(1), parts.drop(2).toSeq))
      else None
    }.toDF("gid", "sid", "msg", "refs")
  }

  /** gen-msg.map: `gid || aid || msg`. */
  def genMap(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    lines(path).flatMap { l =>
      val parts = l.split("\\|\\|").map(_.trim)
      if (parts.length >= 3 && asciiDigits(parts(0)) &&
          asciiDigits(parts(1)))
        Some((parts(0).toLong, parts(1).toLong, parts(2)))
      else None
    }.toDF("gid", "sid", "msg")
  }

  /** classification.config: `config classification: name,desc,prio`;
    * the classification id is the 1-based ordinal of the line — the
    * same convention idstools' ClassificationMap uses.
    */
  def classMap(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val prefix = "config classification:"
    lines(path).filter(_.toLowerCase.startsWith(prefix))
      .zipWithIndex
      .flatMap { case (l, i) =>
        val parts = l.substring(prefix.length).split(",").map(_.trim)
        if (parts.length >= 3 && asciiDigits(parts(2)))
          Some((i + 1L, parts(0), parts(1), parts(2).toLong))
        else None
      }.toDF("class_id", "class_name", "class_desc", "class_priority")
  }

  /** Combined signature lookup: sid-msg entries (gid 1) + gen-msg
    * entries for every other generator, one row per (gid, sid).
    */
  def combinedSigMap(spark: SparkSession, sidPath: String,
      genPath: String): DataFrame =
    sigMap(spark, sidPath).select(col("gid"), col("sid"), col("msg"))
      .unionByName(genMap(spark, genPath).filter(col("gid") =!= 1))

  /** Enrich alerts with signature metadata; unmapped (gid, sid) falls
    * back to `Unknown Alert g:s`, rev 0, priority 10 — byte-for-byte
    * the reference's fallback (__init__.py:186-194).
    */
  def enrichSignatures(alerts: DataFrame, sigs: DataFrame): DataFrame =
    alerts.join(
        broadcast(sigs.withColumnRenamed("msg", "sig_msg")
          .withColumnRenamed("gid", "m_gid").withColumnRenamed("sid", "m_sid")),
        alerts("generator_id") === col("m_gid") &&
          alerts("signature_id") === col("m_sid"),
        "left_outer")
      .withColumn("sig_msg", coalesce(col("sig_msg"),
        format_string("Unknown Alert %d:%d", col("generator_id"),
          col("signature_id"))))
      .withColumn("sig_rev",
        when(col("m_sid").isNull, lit(0L)).otherwise(
          coalesce(col("signature_revision"), lit(1L))))
      .withColumn("sig_priority",
        when(col("m_sid").isNull, lit(10L)).otherwise(col("priority_id")))
      .drop("m_gid", "m_sid")

  /** Enrich with classification names; unknown ids get
    * `unknown-classification` (__init__.py:197-204).
    */
  def enrichClassifications(alerts: DataFrame, classes: DataFrame): DataFrame =
    alerts.join(broadcast(classes),
        alerts("classification_id") === classes("class_id"), "left_outer")
      .withColumn("class_name",
        coalesce(col("class_name"), lit("unknown-classification")))
      .drop("class_id")
}
