package graft

import org.apache.spark.sql.functions._

import graft.queries.Queries

/** Pins the q65 ExactSubstr-dedup semantics (Lee et al.,
  * arXiv:2107.06499 reformulated as windowed hashing) on a constructed
  * corpus where every coverage case is hand-computable:
  *
  *  - cross-doc duplicated run longer than W → overlapping windows
  *    merge into one island (union size = run length, not k*W);
  *  - WITHIN-doc repetition counts as duplication (count>1 globally),
  *    and two occurrences W+1 apart stay two islands;
  *  - docs shorter than W contribute no windows and are kept;
  *  - exact twin docs are fully covered (ratio 1.0) and dropped.
  */
class ExactSubstrSpec extends SparkSpecBase {

  private val W = 8

  test("q65 coverage: island merge, self-repeat, short docs, twins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("exactsubstr").toString

    def toks(prefix: String, n: Int): String =
      (1 to n).map(prefix + _).mkString(" ")

    val docs = Seq(
      // docs 1/2 share the 10-token run a1..a10 → starts {0,1,2} and
      // {2,3,4}: one island of 10 covered tokens each
      (1L, toks("a", 10) + " x1 x2"),
      (2L, "z1 z2 " + toks("a", 10)),
      // doc 3 repeats its OWN 8-gram b1..b8 at starts 0 and 9 (gap 9
      // >= W → two islands): 16 of 17 tokens covered
      (3L, toks("b", 8) + " mid " + toks("b", 8)),
      // doc 4: 7 tokens < W → no windows at all
      (4L, toks("c", 7)),
      // doc 5: 12 unique tokens, no duplicated window anywhere
      (5L, toks("u", 12)),
      // docs 6/7: exact 8-token twins → full coverage, dropped
      (6L, toks("d", 8)),
      (7L, toks("d", 8)))
    docs.toDF("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Queries.all.find(_.name == "q65_exact_substr_dedup").get
      .fn(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        col("dup_ratio"), col("kept"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))

    assert(out.toSeq == Seq(
      (1L, 12, 10L, 0.8333, 0),
      (2L, 12, 10L, 0.8333, 0),
      (3L, 17, 16L, 0.9412, 0),
      (4L, 7, 0L, 0.0, 1),
      (5L, 12, 0L, 0.0, 1),
      (6L, 8, 8L, 1.0, 0),
      (7L, 8, 8L, 1.0, 0)))
  }
}
