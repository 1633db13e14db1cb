package graft

import java.nio.file.{Files, Paths}

import graft.model.{Doc, Span}
import graft.parse.{AltoWriter, PdfWriter}
import graft.run.IngestAny

/** Mixed-format corpus ingestion: one scan, magic-byte dispatch to the
  * ALTO/PAGE, HTML and PDF parsers, one canonical span table out. */
class IngestAnySpec extends SparkSpecBase {

  test("sniff: magic bytes beat extensions") {
    assert(IngestAny.sniff("%PDF-1.4\n…".getBytes("ISO-8859-1")) == IngestAny.FmtPdf)
    assert(IngestAny.sniff("<?xml version='1.0'?><alto>".getBytes("UTF-8")) == IngestAny.FmtXml)
    assert(IngestAny.sniff("<!DOCTYPE html><html>".getBytes("UTF-8")) == IngestAny.FmtHtml)
    assert(IngestAny.sniff("  <html lang='de'>".getBytes("UTF-8")) == IngestAny.FmtHtml)
    assert(IngestAny.sniff(Array[Byte](0, 1, 2, 3)) == IngestAny.FmtUnknown)
  }

  test("mixed directory: xml + html + pdf + junk through one scan") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-any").toString

    // an ALTO file rendered from a generated doc (same tokens back)
    val doc = graft.gen.CorpusGen.docs(spark, 1, "interleaved").collect().head
    Files.write(Paths.get(s"$tmp/alto_doc.xml"), AltoWriter.render(doc))

    // an HTML page: nav is boilerplate, article is content, one image
    Files.write(Paths.get(s"$tmp/web_doc.html"),
      ("<html><body><nav><a href='/'>home</a> <a href='/a'>about</a>" +
        " <a href='/c'>impressum</a></nav>" +
        "<article><p>echter inhalt mit genug worten hier</p>" +
        "<img src='bild.png'/></article></body></html>").getBytes("UTF-8"))

    // a compressed PDF
    Files.write(Paths.get(s"$tmp/print_doc.pdf"), PdfWriter.render(
      Seq(Seq((72.0, 700.0, "gedruckter inhalt"), (72.0, 686.0, "zweite zeile"))),
      flate = true))

    // junk that matches the glob but no format → failure row, not a crash
    Files.write(Paths.get(s"$tmp/broken.xml"), Array[Byte](9, 9, 9))

    val out = IngestAny.parseDocs(IngestAny.readFiles(spark, Seq(tmp)))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out.keySet == Set("alto_doc", "web_doc", "print_doc", "broken"))

    def texts(d: Doc) = d.spans.filter(_.kind == Span.KindText).map(_.text)

    // ALTO round-trip: the generated doc's text tokens come back
    assert(texts(out("alto_doc")) ==
      doc.spans.filter(_.kind == Span.KindText).map(_.text))

    // HTML: nav dropped (link density), article kept, image → media span
    assert(texts(out("web_doc")) ==
      Seq("echter", "inhalt", "mit", "genug", "worten", "hier"))
    assert(out("web_doc").spans.count(_.kind == Span.KindMedia) == 1)

    // PDF: tokens in reading order
    assert(texts(out("print_doc")) ==
      Seq("gedruckter", "inhalt", "zweite", "zeile"))

    // junk: one error row
    assert(out("broken").spans.map(_.kind) == Seq(graft.run.IngestXml.KindError))
  }

  test("basename collisions across subtrees get distinct doc_ids; BOM'd XML parses") {
    val tmp = Files.createTempDirectory("graft-coll").toString
    Files.createDirectories(Paths.get(s"$tmp/a"))
    Files.createDirectories(Paths.get(s"$tmp/b"))
    val doc = graft.gen.CorpusGen.docs(spark, 1, "interleaved").collect().head
    val xml = AltoWriter.render(doc)
    Files.write(Paths.get(s"$tmp/a/0001.xml"), xml)
    // same basename, different subtree, BOM-prefixed payload
    Files.write(Paths.get(s"$tmp/b/0001.xml"),
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ xml)
    Files.write(Paths.get(s"$tmp/a/unique.xml"), xml)

    val out = IngestAny.parseDocs(IngestAny.readFiles(spark, Seq(tmp))).collect()
    assert(out.length == 3)
    val ids = out.map(_.doc_id).toSet
    assert(ids.size == 3, s"conflated ids: $ids")
    assert(ids.contains("unique"), "non-colliding basename stays unsuffixed")
    assert(ids.count(_.startsWith("0001#")) == 2, s"colliders unsuffixed: $ids")
    // the BOM'd copy parsed as XML (no error spans anywhere)
    assert(out.forall(_.spans.forall(_.kind != graft.run.IngestXml.KindError)))
  }

  test("BOM bytes are stripped before decode: XML parses, HTML first word is clean") {
    // the decoded U+FEFF is a StAX prolog error on a plain JDK factory
    // and would otherwise glue onto the first HTML word — both paths
    // must decode from AFTER the BOM, not just sniff past it
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val tmp = Files.createTempDirectory("graft-bom").toString
    val doc = graft.gen.CorpusGen.docs(spark, 1, "interleaved").collect().head
    Files.write(Paths.get(s"$tmp/bom_doc.xml"), bom ++ AltoWriter.render(doc))
    Files.write(Paths.get(s"$tmp/bom_page.html"), bom ++
      "<html><body><p>klares erstes wort hier</p></body></html>".getBytes("UTF-8"))

    val out = IngestAny.parseDocs(IngestAny.readFiles(spark, Seq(tmp)))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out("bom_doc").spans.forall(_.kind != graft.run.IngestXml.KindError))
    assert(out("bom_doc").spans.filter(_.kind == Span.KindText).map(_.text) ==
      doc.spans.filter(_.kind == Span.KindText).map(_.text))
    val toks = out("bom_page").spans.filter(_.kind == Span.KindText).map(_.text)
    assert(toks == Seq("klares", "erstes", "wort", "hier"), s"got $toks")
    assert(toks.head.head != '\uFEFF')
  }
}
