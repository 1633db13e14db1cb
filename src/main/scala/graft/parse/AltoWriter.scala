package graft.parse

import graft.model.{Doc, Span}

/** Sink-side ALTO v3 renderer — the engine's analog of the reference's
  * canonical XML writer (write_xml_file, lib/ocr_step.py:605-619):
  * deterministic layout, UTF-8, CRLF line endings. Span-model is the
  * source of truth; XML is a presentation concern, so this lives at
  * the edge (S8/S9), never inside the pipeline.
  *
  * Layout: spans sorted by offset; consecutive text spans sharing a
  * `line://<block>/<line>` ref become one `TextLine` of `String`
  * elements inside their `TextBlock`; media spans become
  * `Illustration` elements carrying their placeholder ref as FILEID.
  * Round-trip guarantee: `OcrXmlParser.parse` + `toSpans` over the
  * rendered document reproduces the span sequence
  * `(kind, text, media_ref, order)` (offsets re-densified; chars
  * illegal in XML 1.0 are the documented lossy edge → U+FFFD).
  *
  * Known schema caveat: a media span interleaved INSIDE a block's text
  * reopens that `TextBlock`/`TextLine` under the same ID — the
  * engine's own round trip is exact (refs derive from those IDs), but
  * an xsd:ID-validating external consumer would flag the duplicates;
  * renaming would break span-ref equality, so the trade is documented
  * rather than hidden.
  */
object AltoWriter {

  private val NsV3 = "http://www.loc.gov/standards/alto/ns-v3#"

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        // attribute-value normalization would fold raw TAB/CR/LF into
        // spaces on re-parse — numeric refs keep the round trip exact
        case '\t' => sb.append("&#9;")
        case '\n' => sb.append("&#10;")
        case '\r' => sb.append("&#13;")
        // chars illegal in XML 1.0 (possible via HTML/PDF ingest)
        // cannot be represented at all: U+FFFD, documented lossy edge
        case c if c < ' ' => sb.append('�')
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Basename before the first dot (Python-`split('.')[0]` semantics:
    * all-dot ids yield "", never an exception). */
  private def stem(id: String): String = {
    val dot = id.indexOf('.')
    if (dot < 0) id else id.substring(0, dot)
  }

  /** Render one document to canonical ALTO v3 bytes (CRLF, UTF-8). */
  def render(doc: Doc): Array[Byte] = {
    val lines = new scala.collection.mutable.ArrayBuffer[String]
    lines += """<?xml version="1.0" encoding="UTF-8"?>"""
    lines += s"""<alto xmlns="$NsV3">"""
    lines += s"""  <Description><sourceImageInformation><fileIdentifier>${esc(stem(doc.doc_id))}</fileIdentifier><fileName>${esc(doc.doc_id)}</fileName></sourceImageInformation></Description>"""
    lines += s"""  <Layout><Page ID="p${esc(stem(doc.doc_id))}"><PrintSpace>"""

    val sorted = doc.spans.sortBy(_.offset)
    var openBlock: String = null
    var openLine: String = null
    def closeLine(): Unit = if (openLine != null) { lines += "        </TextLine>"; openLine = null }
    def closeBlock(): Unit = {
      closeLine()
      if (openBlock != null) { lines += "      </TextBlock>"; openBlock = null }
    }
    sorted.foreach { s =>
      if (s.kind == Span.KindText) {
        val key = Span.lineKey(s.media_ref)
        val parts = if (key == null) Array("", "") else key.split("/", 2)
        val (block, line) =
          (parts.headOption.getOrElse(""), if (parts.length > 1) parts(1) else "")
        if (block != openBlock) {
          closeBlock()
          lines += s"""      <TextBlock ID="${esc(block)}">"""
          openBlock = block
        }
        if (line != openLine) {
          closeLine()
          lines += s"""        <TextLine ID="${esc(line)}">"""
          openLine = line
        }
        lines += s"""          <String CONTENT="${esc(s.text)}"/>"""
      } else if (s.kind == Span.KindMedia) {
        closeBlock()
        lines += s"""      <Illustration ID="${esc(s.media_ref)}"/>"""
      }
    }
    closeBlock()
    lines += "  </PrintSpace></Page></Layout>"
    lines += "</alto>"
    // CRLF canonical bytes (lib/ocr_step.py:616-617)
    (lines.mkString("\r\n") + "\r\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
