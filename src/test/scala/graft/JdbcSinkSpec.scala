package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.snort.SnortStar

/** Real JDBC round-trip for the star-schema sink (the reference's
  * MySQL writer): Spark ships embedded Derby, so the writer is driven
  * against an actual database — table creation, append semantics and
  * type mapping included — and read back through spark.read.jdbc.
  */
class JdbcSinkSpec extends SparkSuite {

  test("star tables survive a JDBC write + readback round-trip") {
    val db = Files.createTempDirectory("graft_jdbc").toString + "/star"
    val url = s"jdbc:derby:$db;create=true"
    val props = new Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")

    val star = SnortStar.normalize(SnortOps.fixtureAlerts(spark))
    // Derby has no BLOB-literal-free append for empty frames; write the
    // fact + header tables with rows (payload binary included)
    val written = star.filter(_._2.count() > 0)
    SnortStar.writeJdbc(written, url, props)

    written.foreach { case (name, df) =>
      val back = spark.read.jdbc(url, name, props)
      assert(back.count() == df.count(), s"$name row count")
      assert(back.columns.sorted.toSeq ==
        df.columns.map(_.toLowerCase).sorted.toSeq ||
        back.columns.map(_.toLowerCase).sorted.toSeq ==
          df.columns.map(_.toLowerCase).sorted.toSeq,
        s"$name schema: ${back.columns.mkString(",")}")
    }

    // spot-check a value path: event rows keep their (sid, cid) keys
    val ev = spark.read.jdbc(url, "event", props)
    val expected = star("event")
      .select(col("sid").cast("long"), col("cid").cast("long"))
      .orderBy(col("sid"), col("cid")).collect().toSeq
    val got = ev.select(col("sid").cast("long"), col("cid").cast("long"))
      .orderBy(col("sid"), col("cid")).collect().toSeq
    assert(got == expected)
  }
}
