package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: the extraction chain must be
  * reachable from plain SQL via `graft_process_spans`. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_process_spans is callable from spark.sql") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new graft.sql.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val docs = (0L until 10L).map(i =>
        graft.gen.CorpusGen.genDoc(i, "interleaved", 1L, 100))
      docs.toDF().createOrReplaceTempView("docs")
      val out = spark.sql(
        """SELECT doc_id, p.hit_ratio, size(p.spans) AS n
           FROM (SELECT doc_id, graft_process_spans(spans) AS p FROM docs)
           ORDER BY doc_id""").collect()
      assert(out.length == 10)
      assert(out.forall(_.getAs[Int]("n") > 0))
    } finally spark.stop()
  }
}
