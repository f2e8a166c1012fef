package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, built from
  * codegen'd higher-order functions (no UDFs, no driver round-trips).
  * Accumulation is element-order sequential (zip_with + aggregate), so
  * results are deterministic regardless of partitioning.
  */
object Vectors {
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy (as array<double>); pre-normalizing a corpus
    * once turns every later cosine into a bare dot product.
    */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
