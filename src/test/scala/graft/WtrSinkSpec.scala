package graft

import java.nio.file.{Files, Paths}

import graft.stages.{Extraction, ProcessedDoc}

/** Exact `.wtr` byte layout (S11, ocr_pipeline.py:233-269): the sink's
  * output is byte-compared against the string the reference's
  * `store_estimations` + `StepEstimateOCR.analyze` produce for the
  * same estimations (fixture derived by executing that logic verbatim:
  * header `mean,b1..b5,n_total,n_invalid`, valid rows ascending by
  * ratio with `:.3f` ratios, trailing blank line). */
class WtrSinkSpec extends SparkSpecBase {

  private def doc(name: String, ratio: Double, w: Int, e: Int,
      li: Int, nw: Int, ns: Int, lo: Int): ProcessedDoc =
    ProcessedDoc(name, Seq.empty, "p1", name, name,
      ratio, w, e, li, nw, ns, lo)

  test("wtr sink writes the reference byte layout") {
    import spark.implicits._
    val docs = Seq(
      doc("f1", 79.211, 2636, 548, 10, 2, 1, 9),
      doc("f2", 12.5, 30, 5, 4, 0, 1, 3),
      doc("f3", -1.0, 0, 0, 0, 0, 0, 0), // invalid / unestimated
      doc("f4", 100.0, 40, 0, 3, 0, 0, 3),
      doc("f5", 45.333, 50, 10, 6, 1, 1, 5)).toDS()
    val tmp = Files.createTempDirectory("graft-wtr").toString
    val path = s"$tmp/corpus_2026-08-16_12-00.wtr"

    val rep = Extraction.writeWtr(docs, path)
    assert(rep.mean == 59.261 && rep.n_total == 5 && rep.n_invalid == 1)

    val expected =
      "59.261,1,0,0,1,2,5,1\n" +
        "f2,12.500,30,5,4,0,1,3\n" +
        "f5,45.333,50,10,6,1,1,5\n" +
        "f1,79.211,2636,548,10,2,1,9\n" +
        "f4,100.000,40,0,3,0,0,3\n" +
        "\n"
    val actual = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    assert(actual == expected)
  }

  test("wtr sink refuses corpus-scale input before opening the file") {
    import spark.implicits._
    val docs = Seq(
      doc("f1", 10.0, 1, 0, 1, 0, 0, 1),
      doc("f2", 20.0, 1, 0, 1, 0, 0, 1),
      doc("f3", 30.0, 1, 0, 1, 0, 0, 1)).toDS()
    val tmp = Files.createTempDirectory("graft-wtr-cap").toString
    val path = s"$tmp/too_big.wtr"
    val err = intercept[IllegalArgumentException](
      Extraction.writeWtr(docs, path, maxRows = 2))
    assert(err.getMessage.contains("writeReport"))
    // fail-fast: nothing was written (no partial/corrupt artifact)
    assert(!Files.exists(Paths.get(path)))
    // an explicit raise of the cap still works
    Extraction.writeWtr(docs, path, maxRows = 3)
    assert(Files.exists(Paths.get(path)))
  }
}
