package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.sql.BigramTop]] against the relational bigram chain it
  * replaced in q58 (explode → (doc,bigram) count → max/sum, left
  * join), on repetition-heavy and degenerate token arrays. */
class BigramTopSpec extends SparkSpecBase {

  private def relational(base: DataFrame): DataFrame = {
    val bigramTop = base
      .select(col("doc_id"), explode(when(col("n") >= 2,
        transform(sequence(lit(1), col("n") - 1),
          i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
        .otherwise(array().cast("array<string>")))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_bg"))
    base.join(bigramTop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top_cnt"), col("n_bg"))
      .orderBy(col("doc_id"))
  }

  private def viaExpr(base: DataFrame): DataFrame = base
    .withColumn("bt", graft.sql.BigramTop.of(col("tk")))
    .select(col("doc_id"), col("bt.top_cnt").as("top_cnt"),
      col("bt.n_bg").as("n_bg"))
    .orderBy(col("doc_id"))

  private def rows(df: DataFrame) = df.collect().toSeq.map(_.toSeq)

  test("expression == relational bigram chain on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b a b a b a",          // dominant repeated bigram
      2L -> "x",                      // single token -> null row
      3L -> "",                       // split(trim("")) = [""] -> null
      4L -> "w w w w",                // one bigram repeated
      5L -> "a b c d e f",            // all distinct
      6L -> "tür zu tür zu" // multi-byte tokens
    ).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("tk"))
      .withColumn("n", size(col("tk")))
    assert(rows(viaExpr(base)) == rows(relational(base)))
  }

  test("expression == relational bigram chain on sf0.001 documents") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .withColumn("n", size(col("tk")))
    assert(rows(viaExpr(base)) == rows(relational(base)))
  }
}
