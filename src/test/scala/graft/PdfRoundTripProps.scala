package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.model.Span
import graft.parse.{PdfExtract, PdfWriter}

/** Property-based round-trip fuzzing of the PDF writer/parser pair:
  * for ANY token content (including parens, backslashes, PDF
  * delimiters, digits, Latin-1 text), every token survives
  * write → (deflate) → object-scan → content-stream-interpret →
  * layout-sort as exactly one text span, in reading order. */
object PdfRoundTripProps extends Properties("PdfRoundTrip") {

  // Latin-1-printable tokens, biased toward PDF-hostile characters
  private val token: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString),
    Gen.oneOf("(", ")", "\\", "((", "))", "\\(", "a(b)c", "\\\\", "%", "<",
      ">", "[", "]", "/Name", "123.45", "-7", "BT", "ET", "Tj", "stream",
      "endobj", "ÄÖÜß", "àéî"),
    Gen.nonEmptyListOf(Gen.choose(33.toChar, 126.toChar)).map(_.take(8).mkString))

  private val lineGen: Gen[Seq[String]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, token))

  private val pageGen: Gen[Seq[Seq[String]]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, lineGen))

  private def place(lines: Seq[Seq[String]]): Seq[(Double, Double, String)] =
    lines.zipWithIndex.map { case (ws, i) => (72.0, 720.0 - i * 14.0, ws.mkString(" ")) }

  property("every token survives the round trip, in order") =
    forAll(pageGen, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (lines, flate, objStm) =>
        val pdf = PdfWriter.render(Seq(place(lines)), flate = flate,
          objStm = objStm)
        val got = PdfExtract.extract(pdf, "p").filter(_.kind == Span.KindText).map(_.text)
        val want = lines.flatMap(_.flatMap(_.split("\\s+")).filter(_.nonEmpty))
        got == want
    }

  property("line refs follow the placement lines that carry tokens") =
    forAll(pageGen) { lines =>
      val pdf = PdfWriter.render(Seq(place(lines)))
      val spans = PdfExtract.extract(pdf, "p").filter(_.kind == Span.KindText)
      val nonEmpty = lines.count(_.exists(_.split("\\s+").exists(_.nonEmpty)))
      spans.map(_.media_ref).distinct.length == nonEmpty
    }

  property("offsets are a total order") = forAll(pageGen) { lines =>
    val spans = PdfExtract.extract(PdfWriter.render(Seq(place(lines))), "p")
    spans.map(_.offset) == spans.indices
  }
}
