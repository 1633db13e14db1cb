package graft

import org.apache.spark.sql.functions._

import graft.sql.Skew

/** Salted repartition / skew-safe join semantics. */
class SkewSpec extends SparkSpecBase {

  test("saltedJoin equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(10000)
      .select($"id", when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999)).as("k"))
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "v")
    val expected = big.join(small, "k").select($"id", $"v")
      .as[(Long, String)].collect().sorted.toSeq
    val got = Skew.saltedJoin(big, small, "k", salts = 8).select($"id", $"v")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == expected)
  }

  test("scatter spreads a mega-doc-heavy corpus across all partitions") {
    import spark.implicits._
    val docs = graft.gen.CorpusGen.docs(spark, 2000, "skewed", 42L, 5000).toDF()
    val scattered = Skew.scatter(docs, 16, col("doc_id"))
    val sizes = scattered.groupBy(spark_partition_id()).count()
      .as[(Int, Long)].collect().map(_._2)
    // AQE may coalesce small shuffle partitions; the property that
    // matters is that no partition dominates (no mega-doc hot spot)
    assert(sizes.sum == 2000)
    assert(sizes.length >= 8, s"too few partitions: ${sizes.mkString(",")}")
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(_ < mean * 3), sizes.mkString(","))
  }
}
