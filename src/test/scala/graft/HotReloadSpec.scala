package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.Unified2Fixture
import graft.streaming.Spool

/** Map hot-reload semantics: the reference rehashes sid-msg.map when
  * its mtime changes (__init__.py:182-199); graft re-reads maps per
  * micro-batch, so edits apply to the NEXT batch without a restart —
  * and without rewriting history already ingested.
  */
class HotReloadSpec extends SparkSuite {

  test("edited sid-msg.map applies to the next micro-batch only") {
    val root = Files.createTempDirectory("graft-hotreload").toString
    val spool = s"$root/spool"
    Unified2Fixture.writeSpool(spool)
    val (sid, gen, cls) = Unified2Fixture.writeMaps(s"$root/maps")
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"

    def ingest(): Unit = Spool.ingestOnce(spark, Seq(spool), "snort.log",
      "s1", sid, gen, cls, out, ckpt)

    ingest()
    val v1 = spark.read.parquet(out)
    assert(v1.filter(col("signature_id") === 1000001L &&
      col("sig_msg") === "WEB-MISC test http alert").count() > 0)

    // operator updates the ruleset on disk: 1000001 gets a new message
    Files.writeString(Paths.get(sid),
      """|1000001 || WEB-MISC test http alert RENAMED
         |1000002 || DNS suspicious query
         |1000003 || POLICY http proxy connect
         |""".stripMargin)
    // rollover: a new alert with sig 1000001 arrives
    val extra = Unified2Fixture.eventV2(1, 42, 1700000200L, 1000001, 1, 3,
      2, 1, Array[Byte](10, 1, 1, 1), Array[Byte](10, 2, 2, 2), 7, 8, 6)
    Files.write(Paths.get(spool, "snort.log.1700000200"), extra)

    ingest()
    val v2 = spark.read.parquet(out)
    // the new alert is enriched with the UPDATED message...
    val newRow = v2.filter(col("event_id") === 42L).collect()
    assert(newRow.length == 1)
    assert(newRow.head.getAs[String]("sig_msg") ==
      "WEB-MISC test http alert RENAMED")
    // ...while already-ingested rows are untouched (append-only sink)
    assert(v2.filter(col("sig_msg") === "WEB-MISC test http alert")
      .count() == v1.filter(col("sig_msg") === "WEB-MISC test http alert")
      .count())
  }
}
