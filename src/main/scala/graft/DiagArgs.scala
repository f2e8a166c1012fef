package graft

/** Shared argv parsing for the diagnostic timing mains
  * (KnnGraphStages, TimerSessStages, Q71Ab, SessPlateau): positional
  * corpus dirs plus `--flag [value]` options. The one subtlety it
  * exists for: a value-taking flag's VALUE must be consumed with the
  * flag — `Q71Ab target/sf10u --reps 5` must not treat "5" as a corpus
  * dir (the naive `filterNot(_.startsWith("--"))` did exactly that).
  *
  * ValueFlags is the ONE central list of value-taking flags (ADVICE
  * r19: SessPlateau's `--buckets` landed without an entry here, so
  * `SessPlateau target/sf10 --buckets 24` read "24" as a corpus dir —
  * the exact bug this object was created to fix). A main introducing
  * a new value flag adds it here; Round20Spec cross-checks every
  * intFlag call site's flag string against this set.
  */
private[graft] object DiagArgs {

  /** Flags that consume the following token as their value. */
  private[graft] val ValueFlags = Set("--reps", "--parts", "--buckets")

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

  /** Value of an int-valued flag, e.g. intFlag(args, "--reps").
    * A non-integer value fails LOUD with the flag named (ADVICE r19:
    * a bare NumberFormatException gave no usage hint while dirs()
    * still consumed the bad token — the two parses disagreed about
    * the same argv).
    */
  def intFlag(args: Array[String], flag: String): Option[Int] = {
    require(ValueFlags(flag),
      s"intFlag('$flag') is not in DiagArgs.ValueFlags — dirs() would " +
        "treat its value as a corpus dir; add it to the central set")
    args.sliding(2).collectFirst { case Array(`flag`, n) =>
      try n.toInt
      catch { case _: NumberFormatException =>
        sys.error(s"$flag expects an integer, got '$n'")
      }
    }
  }
}
