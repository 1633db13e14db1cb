package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one-pass md5-winnow expression ([[graft.sql.Md5WinnowFps]])
  * against the relational chain it replaced in q60 (posexplode →
  * window-min → filter → collect_set/array_sort), on adversarial
  * inputs: texts shorter than the window, exact-k texts, repeated
  * minima, and multi-byte UTF-8 (the expression slices grams on
  * CODE-POINT boundaries like `substr` does). */
class Md5WinnowFpsSpec extends SparkSpecBase {

  private val K = 5
  private val W = 4

  /** q60's original formulation, verbatim. */
  private def relational(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .filter(length(col("text")) >= K)
      .select(col("doc_id"), col("text"),
        (length(col("text")) - K + 1).as("n"))
    val grams = base
      .select(col("doc_id"), col("n"),
        posexplode(transform(sequence(lit(1), col("n")),
          i => col("text").substr(i, lit(K)))).as(Seq("p", "gram")))
      .select(col("doc_id"), col("n"), (col("p") + 1).as("i"),
        md5(col("gram")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, W - 1)
    grams.withColumn("fp", min(col("h")).over(win))
      .filter(col("i") <= greatest(col("n") - W + 1, lit(1)))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("fp"))).as("fps"))
      .orderBy(col("doc_id"))
  }

  private def viaExpr(docs: DataFrame): DataFrame = docs
    .filter(length(col("text")) >= K)
    .select(col("doc_id"),
      graft.sql.Md5WinnowFps.fps(col("text"), K, W).as("fps"))
    .orderBy(col("doc_id"))

  private def rows(df: DataFrame): Seq[(Long, Seq[String])] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getSeq[String](1).toSeq))

  test("expression == relational winnow chain on edge-case corpus") {
    import spark.implicits._
    val docs = Seq(
      1L -> "abcde",                       // exactly k chars: one gram
      2L -> "abcdef",                      // n=2 < w: one clamped window
      3L -> "abcdefgh",                    // n=4 == w
      4L -> "abcdefghij",                  // n=6 > w
      5L -> "aaaaaaaaaaaaaaaa",            // all grams equal → one fp
      6L -> "abab" * 12,                   // periodic → repeated minima
      7L -> "Größenmaßstäbe der Maße öäü", // multi-byte UTF-8
      8L -> "ſðe mittelalterliche Züge",   // 3-byte + 2-byte chars
      9L -> ("der alte Mann und das Meer " * 8).trim,
      10L -> "abcd"                        // shorter than k: filtered out
    ).toDF("doc_id", "text")
    val exp = rows(relational(docs))
    val got = rows(viaExpr(docs))
    assert(got == exp)
    assert(!exp.exists(_._1 == 10L)) // the filter drops short docs
  }

  test("expression == relational chain on the sf0.001 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val exp = rows(relational(docs))
    val got = rows(viaExpr(docs))
    assert(got.size == exp.size && got == exp)
  }
}
