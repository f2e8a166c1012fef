package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata, post-`Tables.t`.
  *
  * The driver has regenerated `/root/testdata` under the suite twice
  * (r6: events.ts as TIMESTAMP_NS, r9: TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) → TIMESTAMP_NTZ), each time silently breaking
  * every event-time entry at analysis. This spec turns the next drift
  * into one loud assertion instead of 14 scattered analysis errors.
  */
class TablesSpec extends SparkSuite {

  private def types(name: String): Map[String, DataType] =
    Tables.t(spark, sfDir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  // any civil/instant encoding the date-function entries tolerate
  private def timestampish(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType || t == DateType

  test("events.ts normalizes to TimestampType whatever the encoding") {
    val ev = types("events")
    assert(ev("ts") == TimestampType,
      s"events.ts must be TimestampType post-Tables.t, got ${ev("ts")} — " +
        "unix_micros/window/withWatermark all fail on anything else")
    assert(ev("event_id") == LongType && ev("user_id") == LongType &&
      ev("event_type") == StringType && ev("value") == DoubleType &&
      ev("props") == StringType)
  }

  test("fact/dim key and measure types match what the queries assume") {
    val li = types("lineitem")
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType &&
      li("l_suppkey") == LongType && li("l_linenumber") == IntegerType &&
      li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType &&
      li("l_discount") == DoubleType && li("l_tax") == DoubleType &&
      li("l_returnflag") == StringType && li("l_linestatus") == StringType)
    assert(timestampish(li("l_shipdate")), s"l_shipdate: ${li("l_shipdate")}")
    val o = types("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_totalprice") == DoubleType && o("o_orderstatus") == StringType)
    assert(timestampish(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")
    assert(types("customer")("c_custkey") == LongType)
    assert(types("customer")("c_nationkey") == IntegerType)
    assert(types("nation")("n_nationkey") == IntegerType)
    assert(types("region")("r_regionkey") == IntegerType)
    assert(types("supplier")("s_suppkey") == LongType)
    assert(types("part")("p_partkey") == LongType)
  }

  test("documents/embeddings shapes for the dedup/ANN families") {
    val d = types("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType &&
      d("n_chars") == LongType)
    val e = types("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding: ${e("embedding")}")
  }

  test("normalizeEventTs handles all three physical ts encodings") {
    import spark.implicits._
    val base = "target/fixtures/ts-encodings"
    val micros = Seq(1700000000000000L, 1700000123456789L)

    // micros-NTZ (the r9 driver encoding): write TIMESTAMP_NTZ parquet
    val ntzDir = s"$base/ntz"
    micros.toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    val ntz = spark.read.parquet(ntzDir)
    assert(ntz.schema("ts").dataType == TimestampNTZType) // fixture sanity
    val ntzNorm = Tables.normalizeEventTs(ntz)
    assert(ntzNorm.schema("ts").dataType == TimestampType)
    assert(ntzNorm.select(unix_micros(col("ts"))).as[Long].collect().sorted
      === micros.toArray, "NTZ cast must preserve stored micros (UTC session)")

    // nanos-as-long (the pre-r9 encoding, via the legacy read flag)
    val longDf = micros.map(_ * 1000L).toDF("ts")
    val longNorm = Tables.normalizeEventTs(longDf)
    assert(longNorm.schema("ts").dataType == TimestampType)
    assert(longNorm.select(unix_micros(col("ts"))).as[Long].collect().sorted
      === micros.toArray)

    // already-TimestampType: passthrough untouched
    val tz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeEventTs(tz).schema("ts").dataType == TimestampType)
    assert(Tables.normalizeEventTs(tz).select(unix_micros(col("ts")))
      .as[Long].collect().sorted === micros.toArray)
  }
}
