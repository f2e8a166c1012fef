package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + numeric-determinism helpers shared by every query.
  *
  * Determinism contract: any aggregate over a non-integer-valued double
  * column is computed over an exact `DECIMAL` cast (order-independent in
  * both Spark and DuckDB) and only cast back to `double` at the end, so
  * results hash-match the DuckDB oracle regardless of partitioning or
  * accumulation order. Integer-valued doubles (e.g. l_quantity) sum
  * exactly in binary floating point below 2^53 and need no cast.
  */
object Tables {
  /** Parquet table under the driver-provided scale-factor dir.
    *
    * `events.ts` is nanosecond-precision parquet, which Spark 4 only
    * reads as a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set in
    * Verify/Bench). Convert to a microsecond timestamp with integer DIV
    * (floor) — exactly how DuckDB 1.x narrows TIMESTAMP_NS on read, so
    * both engines see identical µs instants.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema.fields.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Exact decimal view of a 2-decimal monetary double column.
    * DECIMAL(12,2) so that a triple product still fits precision 38
    * with no scale loss in either engine.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum, surfaced as double (same IEEE value in both
    * engines since the decimal is exact). DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
