package graft

import java.nio.file.{Files, Paths}

import graft.model.Doc
import graft.parse.OcrXmlParser
import graft.stages.{ExtractConfig, Extraction}

/** Single-node, single-thread throughput on the reference's own
  * fixture (500_gray00003.xml, 360-line newspaper page): the honest
  * comparator for "matches-or-beats the reference's single-node
  * throughput". Measures the same work the reference's
  * StepEstimateOCR does per document — XML parse + line model +
  * wrap/sanitize + word counting (the external Tesseract/LanguageTool
  * calls are out of scope on both sides).
  */
object SingleDocBench {
  def main(args: Array[String]): Unit = {
    val path = Paths.get("/root/reference/tests/resources/500_gray00003.xml")
    val xml = new String(Files.readAllBytes(path), java.nio.charset.StandardCharsets.UTF_8)
    val parser = new OcrXmlParser
    val cfg = ExtractConfig(replaceDict = Nil)

    def once(): Int = {
      val parsed = parser.parse(xml)
      val doc = Doc("500_gray00003", OcrXmlParser.toSpans("500_gray00003", parsed))
      Extraction.estimateDoc(doc, cfg).n_words
    }

    (1 to 50).foreach(_ => once()) // JIT warmup
    val n = 200
    val t0 = System.nanoTime()
    var words = 0
    (1 to n).foreach(_ => words = once())
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"single-doc","docs_per_sec":${n / dt}%.2f,"ms_per_doc":${dt / n * 1000}%.3f,"n_words":$words}""")
  }
}
