package graft

import org.apache.spark.sql.Row

/** Pins the q29 span-pipeline output on edge documents the driver's
  * synthetic corpus never exercises (it is hyphen-, digit- and
  * Fraktur-free): sanitize-to-empty lines, digits-only text, empty
  * text, a single short token, and a mixed German line with `ſ` and a
  * mid-line hyphen. The expected tuples were independently produced
  * by the DuckDB oracle replay ([[graft.queries.PipelineOracleSql]])
  * and hand-traced (doc 904: 8 words, errors = {xyz? no — y is a
  * vowel, but len 3 < 4 → error} + {ab, len 2 → error} → 6/8 = 75.0),
  * so this spec cross-checks the Spark pipeline against the oracle's
  * semantics on exactly the paths the correctness gate cannot reach.
  */
class Q29EdgeSpec extends SparkSpecBase {

  test("q29 pipeline matches the oracle replay on edge documents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q29edge").toString
    Seq(
      (900L, "a a a a a a a a a a", "de", "s0", 0),
      (901L, "12 34 567 89 00 11 22 33", "de", "s0", 0),
      (902L, "", "de", "s0", 0),
      (903L, "ab-", "de", "s0", 0),
      (904L, "wort1- wort2 und der geweſen ist xyz ab", "de", "s0", 0))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.Queries.all
      .find(_.name == "q29_span_pipeline").get
      .fn(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
      .toSeq

    val expected = Seq(
      ("900", 10, 0, 0, 0, -1.0),
      ("901", 8, 0, 0, 0, -1.0),
      ("902", 0, 0, 0, 0, -1.0),
      ("903", 1, 0, 0, 0, -1.0),
      ("904", 8, 8, 1, 1, 75.0))
    assert(got === expected)
  }
}
