package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DatasetBridge

import graft.functions.ZValue

/** Z-order (Morton) clustering: interleave the bits of two key columns
  * and range-partition + sort the write on the z-value, so files cover
  * compact RECTANGLES of the 2-D key space instead of hash-random
  * slices — a scan filtering on BOTH keys prunes most files by their
  * min/max footer stats. The layout maintenance half of data skipping
  * at 100 TB (the read half is parquet predicate pushdown, free).
  */
object ZOrder {

  /** 62-bit Morton code of two columns' lower 31 bits. */
  def zvalue(a: Column, b: Column): Column =
    DatasetBridge.column(ZValue(
      DatasetBridge.expression(a), DatasetBridge.expression(b)))

  /** Write `df` into `nFiles` z-clustered parquet files keyed on
    * integral columns `a` and `b`. Keys must lie in [0, 2^31) — the
    * Morton expression fails loudly outside it (silent masking would
    * collide distant keys and void the pruning); rank or bucket wider
    * keys first.
    */
  def writeClustered(df: DataFrame, a: String, b: String,
      path: String, nFiles: Int): Unit = {
    val zv = zvalue(col(a).cast("long"), col(b).cast("long"))
    df.withColumn("_zv", zv)
      .repartitionByRange(nFiles, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .drop("_zv")
      .write.mode("overwrite").parquet(path)
  }
}
