package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DatasetBridge

/** q71_fuzzy_match candidate-volume attribution (VERDICT r18 #2): the
  * entry's measured decade exponent is 1.12 while its VERIFIED pair
  * output grows ~linearly — this main measures where the growth
  * actually lives by printing, per corpus, the deletion-variant
  * bucket (bk) df distribution and the implied candidate-pair volume
  * Σ C(df, 2) the self-join must generate before the banded-lev
  * verify. Reads the same keyed relation the entry builds
  * (Analytics4.q71FuzzyMatch's blocking stage, replicated here so the
  * entry's plan stays untouched).
  *
  * Usage: java -cp ... graft.Q71Diag <sfDir> [<sfDir2> ...]
  */
object Q71Diag {
  def main(args: Array[String]): Unit = {
    val dirs = DiagArgs.dirs(args, default = "target/sf10u")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs) {
      val c = Tables.t(spark, dir, "customer").select(col("c_nationkey"),
        col("c_mktsegment"), col("c_custkey"), col("c_name"))
      val n = c.count()
      val keyed = c
        .withColumn("v", explode(DatasetBridge.column(
          graft.functions.DeletionVariants(
            DatasetBridge.expression(col("c_name")), 2, 16))))
        .select(col("c_custkey").as("key"),
          xxhash64(col("c_nationkey"), col("c_mktsegment"), col("v"))
            .as("bk"))
      val df = keyed.groupBy(col("bk")).agg(count(lit(1)).as("df"))
        .select(col("df")).cache()
      val agg = df.agg(
        count(lit(1)).as("buckets"),
        sum(col("df")).as("occurrences"),
        max(col("df")).as("max_df"),
        sum((col("df") * (col("df") - 1) / 2).cast("long"))
          .as("cand_pairs")).head()
      val hist = df.groupBy(
          when(col("df") === 1, "1")
            .when(col("df") <= 2, "2")
            .when(col("df") <= 4, "3-4")
            .when(col("df") <= 8, "5-8")
            .when(col("df") <= 16, "9-16")
            .when(col("df") <= 64, "17-64")
            .when(col("df") <= 256, "65-256")
            .otherwise(">256").as("band"))
        .agg(count(lit(1)).as("buckets"),
          sum((col("df") * (col("df") - 1) / 2).cast("long")).as("pairs"))
        .orderBy(col("band")).collect()
      println(s"Q71DIAG dir=$dir rows=$n buckets=${agg.getLong(0)} " +
        s"occ=${agg.getLong(1)} max_df=${agg.getLong(2)} " +
        s"cand_pairs=${agg.getLong(3)}")
      hist.foreach(r => println(s"Q71DIAG   band=${r.getString(0)} " +
        s"buckets=${r.getLong(1)} pairs=${r.getLong(2)}"))
      df.unpersist()
    }
    spark.stop()
  }
}
