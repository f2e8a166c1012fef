package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{DotProd, JaccardSim}

/** ADVICE r2 regressions: JaccardSim / DotProd can evaluate to NULL
  * even when their array children are non-nullable, so they must not
  * inherit BinaryExpression child nullability — with nullable=false the
  * generated projection unboxes the null result (NPE/garbage).
  */
class NullabilitySpec extends SparkSuite {

  private def nonNullDf(elem: DataType, containsNull: Boolean,
      rows: Seq[Row]): DataFrame = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(elem, containsNull), nullable = false),
      StructField("b", ArrayType(elem, containsNull), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("JaccardSim: nullable, and empty/empty evals to NULL (non-ANSI) with non-nullable children") {
    val df = nonNullDf(StringType, containsNull = false,
      Seq(Row(Seq.empty[String], Seq.empty[String]), Row(Seq("x"), Seq("x"))))
    val out = df.select(DatasetBridge.column(JaccardSim(
      DatasetBridge.expression(df("a")),
      DatasetBridge.expression(df("b")))).as("j"))
    assert(out.schema("j").nullable, "JaccardSim must declare nullable")
    val ansiKey = "spark.sql.ansi.enabled"
    val prev = spark.conf.get(ansiKey)
    try {
      spark.conf.set(ansiKey, "false")
      val rows = out.orderBy(col("j").asc_nulls_last).collect()
      assert(rows(1).isNullAt(0), "empty/empty must be NULL, not NPE")
      assert(rows(0).getDouble(0) == 1.0)
    } finally spark.conf.set(ansiKey, prev)
  }

  test("JaccardSim: empty/empty under ANSI throws the standard DIVIDE_BY_ZERO error, like Divide(0,0)") {
    val df = nonNullDf(StringType, containsNull = false,
      Seq(Row(Seq.empty[String], Seq.empty[String])))
    val out = df.select(DatasetBridge.column(JaccardSim(
      DatasetBridge.expression(df("a")),
      DatasetBridge.expression(df("b")))).as("j"))
    def condition(t: Throwable): Option[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).collectFirst {
        case s: org.apache.spark.SparkThrowable => s.getCondition
      }
    val ansiKey = "spark.sql.ansi.enabled"
    val prev = spark.conf.get(ansiKey)
    try {
      spark.conf.set(ansiKey, "true")
      val jc = condition(intercept[Throwable] { out.collect() })
      val dc = condition(intercept[Throwable] {
        spark.sql("SELECT 0 / 0").collect() })
      assert(dc.contains("DIVIDE_BY_ZERO"), s"Divide baseline: $dc")
      assert(jc == dc, s"JaccardSim must match Divide(0,0): $jc vs $dc")
    } finally spark.conf.set(ansiKey, prev)
  }

  test("DotProd: nullable; NULL on length mismatch and on null element") {
    val df = nonNullDf(FloatType, containsNull = true, Seq(
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),        // 11.0
      Row(Seq(1.0f, 2.0f, 9.0f), Seq(3.0f, 4.0f)),  // mismatch -> NULL
      Row(Seq(1.0f, null), Seq(3.0f, 4.0f))))       // null elem -> NULL
    val out = df.select(DatasetBridge.column(DotProd(
      DatasetBridge.expression(df("a")),
      DatasetBridge.expression(df("b")))).as("d"))
    assert(out.schema("d").nullable, "DotProd must declare nullable")
    val rows = out.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0), "length mismatch must be NULL")
    assert(rows(2).isNullAt(0), "null element must be NULL")
  }

  test("DotProd length-mismatch NULL matches the zip_with+aggregate form") {
    val df = nonNullDf(FloatType, containsNull = true, Seq(
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      Row(Seq(1.0f, 2.0f, 9.0f), Seq(3.0f, 4.0f))))
    val native = df.select(DatasetBridge.column(DotProd(
      DatasetBridge.expression(df("a")),
      DatasetBridge.expression(df("b")))).as("d")).collect()
    val declarative = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) =>
        x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d")).collect()
    native.zip(declarative).foreach { case (n, d) =>
      assert(n.isNullAt(0) == d.isNullAt(0), s"$n vs $d")
      if (!n.isNullAt(0)) assert(n.getDouble(0) == d.getDouble(0))
    }
  }
}
