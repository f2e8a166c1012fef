package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-quantization ANN on planted SEPARABLE clusters: with
  * clearly separated directions, quantization cells align with the
  * clusters and ADC retrieval must return exactly the query's cluster
  * mates first. (The sf embeddings are uniform-random — PQ's worst
  * case — so the entry is rows-only and the semantics are proven
  * here.)
  */
class PQSpec extends SparkSuite {

  /** 64-dim unit vector on a dense per-cluster pattern (every subspace
    * carries cluster signal — axis-aligned blocks would leave zero
    * query sub-vectors and constant ADC scores), plus a small
    * deterministic wobble so cluster members are distinct.
    */
  private def vec(cluster: Int, wobble: Int): Array[Double] = {
    val v = Array.tabulate(64) { d =>
      (((cluster * 37 + d * 11) % 7) - 3).toDouble +
        0.05 * (((wobble * 13 + d) % 5) - 2)
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("PQ: planted clusters are retrieved exactly; codes are 8 small ints") {
    // 24 corpus vectors in 3 interleaved clusters of 8 (cluster =
    // id % 3), so the PqK=16 seed window covers every cluster.
    val rows = (0 until 24).map { i =>
      Row(i.toLong, vec(i % 3, i).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val (cen, codes) = SimilarityOps.trainPq(emb)
    val codeRows = codes.collect()
    assert(codeRows.length == 24)
    codeRows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8, s"8 subspace codes, got ${cs.length}")
      assert(cs.forall(c => c >= 0 && c < 16))
    }

    // every member of each cluster queries back its own 5 cluster
    // mates (never a vector from another block)
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val res = SimilarityOps.pqSearch(cen, codes, q, 5).collect()
    assert(res.length == 24 * 5)
    res.foreach { r =>
      val (qid, vid) = (r.getLong(0), r.getLong(2))
      assert(qid % 3 == vid % 3,
        s"query $qid retrieved $vid from another cluster")
    }
  }

  test("PQ codes are deterministic across retrainings") {
    val rows = (0 until 20).map { i => Row(i.toLong, vec(i % 3, i).toSeq) }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val a = SimilarityOps.trainPq(emb)._2.orderBy(col("vec_id")).collect()
    val b = SimilarityOps.trainPq(emb)._2.orderBy(col("vec_id")).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
