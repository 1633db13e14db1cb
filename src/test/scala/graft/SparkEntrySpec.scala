package graft

/** The driver contract itself: entry() returns rows at sf0.001, every
  * query name has a runnable function, and every oracle key is a
  * query. */
class SparkEntrySpec extends SparkSpecBase {

  test("entry() smoke: flagship pipeline returns rows at sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries; names are stable") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.forall(_.matches("q\\d{2}_[a-z0-9_]+")), s"bad names: $qs")
    assert(qs.size == 65 && os.size == 65)
  }
}
