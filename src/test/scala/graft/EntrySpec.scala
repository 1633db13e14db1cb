package graft

/** Driver smoke contract: SparkEntry.entry must return rows on
  * sf0.001, and every registered query must run there. */
class EntrySpec extends SparkSpecBase {

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query runs at sf0.001 and oracle keys are a subset") {
    val qs = SparkEntry.queries
    assert(qs.size == graft.queries.Queries.all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
