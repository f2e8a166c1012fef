package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.Unified2Fixture
import graft.streaming.SpoolTail

/** The tailing spool source must do what the built-in file source can't
  * (ADVICE r1): keep reading a file that grows between micro-batches,
  * never losing appended records, never double-reading, surviving a
  * checkpoint restart mid-file — the reference's record-level bookmark
  * semantics (/root/reference/charlotte/__init__.py:108-120).
  */
class SpoolTailSpec extends SparkSuite {

  private def ip4(a: Int, b: Int, c: Int, d: Int) =
    Array[Byte](a.toByte, b.toByte, c.toByte, d.toByte)

  private def alert(id: Int): Array[Byte] =
    Unified2Fixture.eventV2(1, id, 1800000000L + id, 1000001, 1, 3, 2, 1,
      ip4(10, 0, 0, id), ip4(192, 168, 1, id), 1000 + id, 80, 6)

  test("tail source follows a growing active file across batches and restarts") {
    val dir = Files.createTempDirectory("graft_tail").toString
    val file = Paths.get(dir, "snort.log.1800000000")
    val r3 = alert(3)

    // batch 1 input: two complete records + a TORN half of record 3
    Files.write(file, alert(1) ++ alert(2) ++ r3.take(r3.length / 2))

    val ckpt = Files.createTempDirectory("graft_tail_ckpt").toString
    val out = Files.createTempDirectory("graft_tail_out").toString
    // parquet sink: the memory sink can't recover from a checkpoint
    def start() = SpoolTail
      .streamRecords(spark, Seq(dir), "snort.log", "sensorT")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def sunk() = spark.read.parquet(out).collect()

    val q1 = start()
    try {
      q1.processAllAvailable()
      val got1 = sunk()
      assert(got1.length == 2, "torn record must not be emitted")
      assert(got1.map(_.getAs[Int]("rec_index")).sorted.toSeq == Seq(0, 1))

      // the active file GROWS: rest of record 3 + record 4 appended
      Files.write(file, r3.drop(r3.length / 2) ++ alert(4),
        StandardOpenOption.APPEND)
      q1.processAllAvailable()
      val got2 = sunk()
      assert(got2.length == 4, "appended records were lost")
      assert(got2.map(_.getAs[Int]("rec_index")).sorted.toSeq ==
        Seq(0, 1, 2, 3), "rec_index must continue across batches")
      assert(got2.map(_.getAs[Long]("event_id")).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      assert(got2.forall(_.getAs[String]("sensor") == "sensorT"))
    } finally q1.stop()

    // restart from checkpoint: only the newly-appended record arrives
    Files.write(file, alert(5), StandardOpenOption.APPEND)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got3 = sunk()
      assert(got3.length == 5, s"bookmark resume broke: ${got3.length} rows")
      assert(got3.map(_.getAs[Long]("event_id")).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L), "record lost or double-read on resume")
      assert(got3.map(_.getAs[Int]("rec_index")).sorted.toSeq ==
        Seq(0, 1, 2, 3, 4))
    } finally q2.stop()
  }

  test("tailIngest runs the full enrich loop over a growing file") {
    val dir = Files.createTempDirectory("graft_tailingest").toString
    val file = Paths.get(dir, "snort.log.1800000000")
    Files.write(file, alert(1) ++ alert(2))
    val (sid, gen, cls) = Unified2Fixture.writeMaps(
      Files.createTempDirectory("graft_tailingest_maps").toString)
    val out = Files.createTempDirectory("graft_tailingest_out").toString
    val ckpt = Files.createTempDirectory("graft_tailingest_ckpt").toString

    graft.streaming.Spool.tailIngest(spark, Seq(dir), "snort.log", "sT",
      sid, gen, cls, out, ckpt, availableNow = true)
    assert(spark.read.parquet(out).count() == 2)

    // active file grows; a second bounded drain ingests ONLY the tail
    Files.write(file, alert(3), StandardOpenOption.APPEND)
    graft.streaming.Spool.tailIngest(spark, Seq(dir), "snort.log", "sT",
      sid, gen, cls, out, ckpt, availableNow = true)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    // enrichment applied: fixture sid 1000001 maps to the known msg
    assert(rows.filter(org.apache.spark.sql.functions.col("sig_msg") ===
      "WEB-MISC test http alert").count() == 3)
  }

  test("purgeIngested deletes only fully-committed rolled-over files") {
    val dir = Files.createTempDirectory("graft_purge").toString
    val f1 = Paths.get(dir, "snort.log.1800000001")
    val f2 = Paths.get(dir, "snort.log.1800000002")
    Files.write(f1, alert(1) ++ alert(2))
    Files.write(f2, alert(3))
    val ckpt = Files.createTempDirectory("graft_purge_ckpt").toString
    val out = Files.createTempDirectory("graft_purge_out").toString

    // nothing committed yet -> nothing purged
    assert(graft.streaming.Spool.purgeIngested(ckpt).isEmpty)

    val q = SpoolTail.streamRecords(spark, Seq(dir), "snort.log", "sP")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 3)

    val purged = graft.streaming.Spool.purgeIngested(ckpt)
    assert(purged == Seq(f1.toString),
      s"only the rolled-over file may go: $purged")
    assert(!Files.exists(f1), "fully-ingested closed file deleted")
    assert(Files.exists(f2), "active file must survive")

    // stream keeps working after the purge: active file grows, resume
    Files.write(f2, alert(4), StandardOpenOption.APPEND)
    val q2 = SpoolTail.streamRecords(spark, Seq(dir), "snort.log", "sP")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 4,
      "purge must not disturb the bookmark of surviving files")
  }

  test("tail source drains a closed spool via AvailableNow") {
    val root = Files.createTempDirectory("graft_tail_closed").toString
    val dir = Unified2Fixture.writeSpool(root + "/spool")
    // executor-side parquet sink, like the engine's own drains — the
    // memory sink is the driver-collect path the r17 wave removed from
    // src/main, and this spec must not keep exercising it (ADVICE r17)
    val out = root + "/out"; val ckpt = root + "/ckpt"
    val q = SpoolTail.streamRecords(spark, Seq(dir), "snort.log", "s1")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    // same record count as the batch binaryFile parser
    val batch = graft.sources.Unified2
      .records(spark, Seq(dir), "snort.log", "s1").count()
    assert(spark.read.parquet(out).count() == batch && batch > 0)
  }

  test("planner fails loud on a record index past Int range (ADVICE r4)") {
    val st = new graft.streaming.SpoolTailStream(Seq("/nonexistent"), "x")
    val start = graft.streaming.SpoolTailOffset(
      Map("/f" -> Seq(0L, Int.MaxValue.toLong + 1)))
    val end = graft.streaming.SpoolTailOffset(
      Map("/f" -> Seq(1024L, Int.MaxValue.toLong + 2)))
    val e = intercept[IllegalArgumentException] {
      st.planInputPartitions(start, end)
    }
    assert(e.getMessage.contains("exceeds Int range"),
      s"wrong failure: ${e.getMessage}")
  }
}
