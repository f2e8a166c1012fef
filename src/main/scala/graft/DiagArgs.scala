package graft

/** Shared argv parsing for the diagnostic timing mains
  * (KnnGraphStages, TimerSessStages, Q71Ab): positional corpus dirs
  * plus `--flag [value]` options. The one subtlety it exists for:
  * a value-taking flag's VALUE must be consumed with the flag —
  * `Q71Ab target/sf10u --reps 5` must not treat "5" as a corpus dir
  * (the naive `filterNot(_.startsWith("--"))` did exactly that).
  */
private[graft] object DiagArgs {

  /** Flags that consume the following token as their value. */
  private val ValueFlags = Set("--reps", "--parts")

  /** Positional (non-flag, non-flag-value) args; `default` if none. */
  def dirs(args: Array[String], default: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (ValueFlags(a)) i += 2
      else if (a.startsWith("--")) i += 1
      else { b += a; i += 1 }
    }
    val ds = b.result()
    if (ds.isEmpty) Seq(default) else ds
  }

  /** Value of an int-valued flag, e.g. intFlag(args, "--reps"). */
  def intFlag(args: Array[String], flag: String): Option[Int] =
    args.sliding(2).collectFirst { case Array(`flag`, n) => n.toInt }
}
