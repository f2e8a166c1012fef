package graft

/** Re-emit a bench run's machine-readable metric line from its logged
  * per-entry BENCHQ measurements against the COMMITTED pins (VERDICT
  * r19 #4): when a pin file is corrected after a run (the r18→r19
  * sf30 reseed), the run's committed artifact otherwise keeps
  * regression flags its own pin file no longer supports — six
  * adjudicated-false flags next to mpr 0.99. This reruns the GATE,
  * not the suite: timings come verbatim from the log; only the
  * pin-relative fields are recomputed, via the same [[Bench.jsonLine]]
  * the live run uses, so the two emitters can never drift. No
  * host_drift field is emitted: drift needs the sentinels measured at
  * suite START, which a pre-r20 log did not order for.
  *
  * Usage: runMain graft.ReemitBench target/bench_sf30_r19.log target/sf30u
  */
object ReemitBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ReemitBench <bench_log> <sfDir-for-pins> [errors]")
    val text = scala.io.Source.fromFile(args(0), "UTF-8").mkString
    val qs = raw"BENCHQ (\S+)\s+([0-9.]+) s".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    require(qs.nonEmpty, s"no BENCHQ lines in ${args(0)}")
    val errors = if (args.length > 2) args(2).toInt else 0
    println(Bench.jsonLine(args(1), qs, errors = errors,
      pins = Bench.loadPins(args(1))))
  }
}
