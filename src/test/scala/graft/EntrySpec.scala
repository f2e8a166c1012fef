package graft

/** The driver's t1 smoke contract: entry() runs on sf0.001 and
  * returns rows; every declared query name resolves; every oracle key
  * has a matching query.
  */
class EntrySpec extends SparkSuite {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
