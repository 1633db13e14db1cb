package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.CorpusGen
import graft.parse.{AltoWriter, OcrXmlParser}

/** XML sink round-trip: render generated docs (interleaved text+media)
  * to canonical ALTO v3 bytes, re-parse with the engine parser, and
  * require span-sequence equality `(kind, text, media_ref, order)`. */
class AltoRoundTripSpec extends AnyFunSuite {

  test("render → parse reproduces the span sequence for all profiles") {
    val parser = new OcrXmlParser
    (0L until 60L).foreach { i =>
      val profile = Seq("uniform", "interleaved", "skewed", "edge")((i % 4).toInt)
      val doc = CorpusGen.genDoc(i, profile, 99L, 1500)
      val bytes = AltoWriter.render(doc)
      val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val parsed = parser.parse(xml)
      val spans = OcrXmlParser.toSpans(doc.doc_id, parsed)
      assert(spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        doc.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)),
        s"round-trip mismatch for ${doc.doc_id} ($profile)")
    }
  }

  test("canonical bytes: CRLF line endings, UTF-8, deterministic") {
    val doc = CorpusGen.genDoc(7L, "interleaved", 99L, 1500)
    val a = AltoWriter.render(doc)
    val b = AltoWriter.render(doc)
    assert(a.sameElements(b))
    val s = new String(a, java.nio.charset.StandardCharsets.UTF_8)
    assert(s.contains("\r\n"))
    assert(!s.replace("\r\n", "").contains("\n"))
    assert(s.contains("""<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">"""))
  }
}
