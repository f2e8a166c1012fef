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
