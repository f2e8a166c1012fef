package graft

import org.apache.spark.sql.functions._

/** Connected components (dedup_clusters): transitivity closure over
  * planted chains, independence of separate components, and
  * fixpoint/label correctness.
  */
class ClusterSpec extends SparkSuite {

  private def cc(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    DedupOps.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  test("closes a chain a-b-c into one component even without the a-c pair") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L,
      s"chain must collapse to min id: $labels")
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(labels.size == 5, "only paired vertices are labeled")
  }

  test("long path converges (diameter > a few rounds)") {
    val path = (0L until 12L).map(i => (i, i + 1))
    val labels = cc(path)
    assert(labels.values.toSet == Set(0L), s"all labels 0: $labels")
  }

  test("fails loudly when the diameter exceeds maxIter (never silent splits)") {
    import spark.implicits._
    val path = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      DedupOps.connectedComponents(path, maxIter = 2).collect()
    }
  }

  test("an EMPTY pair list converges to an empty labeling (no NPE)") {
    // regression: sum() over zero label rows is SQL NULL — the
    // convergence probe must treat it as zero, not NPE
    assert(cc(Seq.empty) == Map.empty)
  }

  test("order of pair endpoints doesn't matter") {
    assert(cc(Seq((2L, 1L), (3L, 2L))) == cc(Seq((1L, 2L), (2L, 3L))))
  }

  test("dedup_clusters groups the fixture's exact+near dups into one cluster") {
    val rows = q("dedup_clusters", Fixtures.dir)
      .orderBy(col("cluster")).collect()
    // docs 0,1 are exact dups and 2 is a near dup of 0 — one cluster,
    // canonical label = min doc_id = 0
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L)
    assert(rows(0).getLong(1) == 3L)
    assert(rows(0).getString(2) == "0,1,2")
  }
}
