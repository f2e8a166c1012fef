package graft

import org.apache.spark.sql.Row

/** Semantics proofs for the recursive-query family (Analytics5) beyond
  * the DuckDB oracle equivalence: known hand-computable facts of the
  * synthetic part forest at sf0.001 (parts 0..199, parent = p div 10).
  */
class GraphSpec extends SparkSuite {

  test("q82 closure: chain 199→19→1 gives depth 2 / root 1; 7 is a root") {
    val rows = q("q82_bom_closure", sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(199L) == Row(199L, 2L, 2L, 1L))
    assert(rows(42L) == Row(42L, 1L, 1L, 4L))
    assert(rows(7L) == Row(7L, 0L, 0L, 7L)) // root: no ancestors
    assert(rows.size == 200)
  }

  test("q83 rollup: leaf subtree = own price; root 1 covers 110 descendants") {
    val rows = q("q83_bom_rollup", sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // 150's children (1500..1509) are beyond sf0.001's 200 parts → leaf
    assert(rows(150L)._1 == 0L)
    // root 1's subtree: 10..19 plus 100..199 = 110 descendants
    assert(rows(1L)._1 == 110L)
    // subtree price of a leaf is its own retail price (exact decimal)
    val own = spark.read.parquet(s"$sfDir/part.parquet")
      .filter("p_partkey = 150").collect()(0)
      .getAs[Double]("p_retailprice")
    assert(rows(150L)._2 == own)
  }

  test("q84 BFS: levels 0/1/2 from part 1; sibling roots unreachable") {
    val rows = q("q84_bfs_hops", sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 0L)
    assert((10L to 19L).forall(rows(_) == 1L))
    assert((100L to 199L).forall(rows(_) == 2L))
    assert(!rows.contains(2L)) // other trees of the forest: no path
    assert(rows.size == 111)
  }

  test("q87 pagerank: mass conserved, hubs outrank leaves") {
    val rows = q("q87_pagerank", sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size == 199) // parts 1..199 (0 is edge-less)
    // undirected damping conserves total mass: sum(rank) == |V|
    assert(math.abs(rows.values.sum - rows.size) < 1e-6)
    // an internal hub (1: ten children + their subtree mass) must far
    // outrank a leaf (199: degree 1)
    assert(rows(1L) > rows(199L) * 2)
  }
}
