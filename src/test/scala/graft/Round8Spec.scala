package graft

import java.nio.file.{Files, Paths}

/** Round-8 additions: scratch-dir housekeeping must delete stale
  * app-stamped dump dirs and keep recent/concurrent ones (the
  * unbounded-accumulation ADVICE), without ever touching unstamped
  * corpus-scoped dirs.
  */
class Round8Spec extends SparkSuite {

  test("appTs extracts the local-mode millis stamp, slugged or raw") {
    assert(OracleDumps.appTs("local-1786601697917").contains(1786601697917L))
    assert(OracleDumps.appTs(
      "_root_testdata_sf0_01__local-1786604451147").contains(1786604451147L))
    // slugged store names turn the dash into an underscore
    assert(OracleDumps.appTs(
      "ivf__root_testdata_sf0_1_local_1786602210252").contains(1786602210252L))
    assert(OracleDumps.appTs("corpus_csv__root_testdata_sf0_01").isEmpty)
    assert(OracleDumps.appTs("oracle_base").isEmpty)
  }

  test("dedup_decontam_frac measures position coverage of eval 13-grams") {
    // eval split doc_id % 5 == 0 -> {0, 5}; doc 5 has <13 tokens, so the
    // eval gram set is exactly doc 0's grams. Doc 1 (exact dup, 28
    // tokens): every gram matches -> all 28 positions covered, frac 1.
    // Doc 2 flips "dog" (position 9) to "cat": only the 7 grams starting
    // at 10..16 survive, covering positions 10..28 = 19. Docs 3/4 share
    // no gram (and 3 has <13 tokens anyway).
    val rows = q("dedup_decontam_frac", Fixtures.dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_tokens") == 28L)
    assert(byId(1L).getAs[Long]("n_contaminated") == 28L)
    assert(byId(1L).getAs[Double]("frac") == 1.0)
    assert(byId(2L).getAs[Long]("n_contaminated") == 19L)
    assert(byId(2L).getAs[Double]("frac") == 19.0 / 28.0)
  }

  test("pruneStale deletes only dirs >3h older than the running app") {
    val scratch = Paths.get(OracleDumps.Base).getParent
    Files.createDirectories(Paths.get(OracleDumps.Base))
    val myTs = 2000000000000L
    val stale = myTs - OracleDumps.StaleMs - 1000
    val fresh = myTs - OracleDumps.StaleMs + 60000
    val staleTop = scratch.resolve(s"ivf_r8spec_local_$stale")
    val staleBase = Paths.get(OracleDumps.Base).resolve(s"r8spec__local-$stale")
    val freshTop = scratch.resolve(s"ivf_r8spec_local_$fresh")
    val unstamped = scratch.resolve("corpus_r8spec_unstamped")
    Seq(staleTop, staleBase, freshTop, unstamped).foreach { d =>
      Files.createDirectories(d)
      Files.writeString(d.resolve("marker.txt"), "x")
    }
    try {
      OracleDumps.pruneStale(myTs)
      assert(!Files.exists(staleTop), "stale top-level dir must be deleted")
      assert(!Files.exists(staleBase), "stale oracle_base dir must be deleted")
      assert(Files.exists(freshTop), "recent dir must survive (could be a concurrent JVM)")
      assert(Files.exists(unstamped), "unstamped corpus dirs are never pruned")
    } finally {
      Seq(freshTop, unstamped).foreach { d =>
        Files.deleteIfExists(d.resolve("marker.txt"))
        Files.deleteIfExists(d)
      }
    }
  }
}
