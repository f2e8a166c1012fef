package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions.col

import graft.sources.Unified2Fixture

/** Crash-recovery soak for the charlotte ingest daemon (VERDICT r11
  * #5): the reference's most battle-tested behavior is its reconnect
  * loop — die mid-work, come back, lose nothing, duplicate nothing
  * (/root/reference/charlotte/__init__.py:372-433, DB transaction +
  * bookmark pairing). The Spark twin must give the same guarantee
  * across the WORST crash window: after the micro-batch's output files
  * land but before the streaming commit log records the batch. On
  * restart Spark replays that batch — a blind parquet append would
  * duplicate every row; Spool.idempotentAppend must not.
  *
  * The crash is simulated deterministically by deleting the newest
  * `commits/<n>` entry from the checkpoint after a clean drain: that
  * is byte-for-byte the on-disk state of a JVM killed between the
  * foreachBatch write and the commit-log append.
  */
class CrashRecoverySpec extends SparkSuite {

  private def ip4(a: Int, b: Int, c: Int, d: Int) =
    Array[Byte](a.toByte, b.toByte, c.toByte, d.toByte)

  private def alert(id: Int): Array[Byte] =
    Unified2Fixture.eventV2(1, id, 1800000000L + id, 1000001, 1, 3, 2, 1,
      ip4(10, 0, 0, id), ip4(192, 168, 1, id), 1000 + id, 80, 6)

  test("replayed micro-batch after a simulated crash neither duplicates nor loses events") {
    val dir = Files.createTempDirectory("graft_crash").toString
    val file = Paths.get(dir, "snort.log.1800000000")
    Files.write(file, alert(1) ++ alert(2))
    val (sid, gen, cls) = Unified2Fixture.writeMaps(
      Files.createTempDirectory("graft_crash_maps").toString)
    val out = Files.createTempDirectory("graft_crash_out").toString
    val ckpt = Files.createTempDirectory("graft_crash_ckpt").toString

    def drain(): Unit = graft.streaming.Spool.tailIngest(spark, Seq(dir),
      "snort.log", "sC", sid, gen, cls, out, ckpt, availableNow = true)
    def ids(): Seq[Long] = spark.read.parquet(out)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq

    drain()
    assert(ids() == Seq(1L, 2L))

    // batch 2 arrives and drains cleanly...
    Files.write(file, alert(3), StandardOpenOption.APPEND)
    drain()
    assert(ids() == Seq(1L, 2L, 3L))

    // ...then the "crash": the batch's OUTPUT is on disk but its commit
    // never landed. Drop the newest commit-log entry — exactly the
    // state a kill between the foreachBatch write and the commit leaves.
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).iterator()
    val names = scala.jdk.CollectionConverters
      .IteratorHasAsScala(newest).asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).toSeq
    assert(names.nonEmpty, "commit log empty — test setup broke")
    val victim = names.map(_.toLong).max.toString
    Files.delete(commits.resolve(victim))
    // local-fs ChecksumFileSystem keeps a .<name>.crc sibling; a real
    // kill never leaves the crc without its data file, so drop it too
    // (leaving it makes the commit rename fail as file-already-exists)
    Files.deleteIfExists(commits.resolve(s".$victim.crc"))

    // restart: Spark replays the uncommitted batch into the SAME sink.
    // Exactly-once means: still exactly one row per event, none lost.
    // The replayed batch REWRITES its own files — the bumped mtime of
    // the batch-1 output proves the batch genuinely re-ran (the test
    // would otherwise pass vacuously if the replay were skipped).
    def b1mtime(): Long = {
      val s = Files.list(Paths.get(out))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala
        .filter(_.getFileName.toString.startsWith("batch_1_"))
        .map(p => Files.getLastModifiedTime(p).toMillis).max
      finally s.close()
    }
    val before = b1mtime()
    Thread.sleep(5) // mtime granularity
    drain()
    assert(ids() == Seq(1L, 2L, 3L),
      s"replay broke exactly-once: ${ids()}")
    assert(b1mtime() > before,
      "batch 1 was never replayed — the crash simulation is vacuous")

    // and the stream still makes progress after the recovery
    Files.write(file, alert(4), StandardOpenOption.APPEND)
    drain()
    assert(ids() == Seq(1L, 2L, 3L, 4L))

    // star-schema row count downstream of the recovered sink: one fact
    // row (cid) per event, no duplicate cids — the reference's "zero
    // duplicate/lost cids across a forced restart" invariant
    val enriched = spark.read.parquet(out)
    assert(enriched.count() == 4)
    assert(enriched.select(col("sensor"), col("event_id"))
      .distinct().count() == 4, "duplicate (sensor, event_id) fact keys")
  }

  test("a torn staging dir from a crash mid-write is invisible and cleaned up") {
    val dir = Files.createTempDirectory("graft_crash2").toString
    val file = Paths.get(dir, "snort.log.1800000000")
    Files.write(file, alert(7))
    val (sid, gen, cls) = Unified2Fixture.writeMaps(
      Files.createTempDirectory("graft_crash2_maps").toString)
    val out = Files.createTempDirectory("graft_crash2_out").toString
    val ckpt = Files.createTempDirectory("graft_crash2_ckpt").toString

    // a previous attempt died mid-write: torn staging dir for batch 0
    val torn = Paths.get(out, ".batch_0.tmp")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))

    graft.streaming.Spool.tailIngest(spark, Seq(dir), "snort.log", "sC2",
      sid, gen, cls, out, ckpt, availableNow = true)
    val rows = spark.read.parquet(out).collect()
    assert(rows.map(_.getAs[Long]("event_id")).toSeq == Seq(7L))
    assert(!Files.exists(torn), "staging dir must be gone after commit")
  }
}
