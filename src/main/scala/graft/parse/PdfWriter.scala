package graft.parse

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Minimal deterministic PDF writer — the fixture/bench generator for
  * [[PdfExtract]] (the role [[AltoWriter]] plays for the XML parser):
  * real file structure (objects, xref, trailer), Helvetica text placed
  * with `Td`, optional FlateDecode content streams (JDK Deflater),
  * optional image XObject per page (a `Do` invocation → media span).
  * No external data, byte-stable for fixed input.
  */
object PdfWriter {

  private def esc(t: String): String =
    t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** PDF numbers use dot decimals; the locale-default formatter would
    * emit comma decimals on de/fr JVMs and corrupt the stream. */
  private def num(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

  /** Canonical token layout shared by the q57 round-trip fixture and
    * the bench corpus generator (GenCorpus format=pdf): 8 tokens per
    * line, 14 pt leading down from (72, 720). Keeping it in ONE place
    * keeps the oracle's span-count invariant and the scaling corpus in
    * sync. */
  def layoutTokens(tokens: Seq[String]): Seq[(Double, Double, String)] =
    tokens.grouped(8).zipWithIndex.map { case (ws, i) =>
      (72.0, 720.0 - i * 14.0, ws.mkString(" "))
    }.toSeq

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val bos = new java.io.ByteArrayOutputStream(b.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    bos.toByteArray
  }

  /** @param pages     per page: (x, y, text) placements (PDF points,
    *                  origin bottom-left)
    * @param flate     FlateDecode the content streams
    * @param withImage add a 1×1 image XObject + `Do` per page
    * @param objStm    pack the dict objects (catalog/pages/font/page)
    *                  into a PDF 1.5 compressed object stream
    *                  (/Type/ObjStm), as modern writers do — stream
    *                  objects stay top-level (ISO 32000 §7.5.7 forbids
    *                  streams inside object streams)
    */
  def render(pages: Seq[Seq[(Double, Double, String)]],
      flate: Boolean = false, withImage: Boolean = false,
      objStm: Boolean = false): Array[Byte] = {
    val nPages = pages.length
    // object layout: 1 catalog, 2 pages, 3 font, [4 image],
    // then per page: pageObj, contentObj
    val fontNum = 3
    val imgNum = if (withImage) 4 else -1
    val firstPage = if (withImage) 5 else 4

    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, Array[Byte]]
    val kids = (0 until nPages).map(i => s"${firstPage + 2 * i} 0 R").mkString(" ")
    objs(1) = s"<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1)
    objs(2) = s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>".getBytes(ISO_8859_1)
    objs(fontNum) =
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>".getBytes(ISO_8859_1)
    if (withImage) {
      val pixel = Array[Byte](0x7F)
      objs(imgNum) = (s"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${pixel.length} >>\n" +
        "stream\n").getBytes(ISO_8859_1) ++ pixel ++ "\nendstream".getBytes(ISO_8859_1)
    }

    pages.zipWithIndex.foreach { case (placements, i) =>
      val pageNum = firstPage + 2 * i
      val contNum = pageNum + 1
      val xobj = if (withImage) s" /XObject << /Im0 $imgNum 0 R >>" else ""
      objs(pageNum) = (s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >>$xobj >> " +
        s"/Contents $contNum 0 R >>").getBytes(ISO_8859_1)
      val body = new StringBuilder("BT /F1 12 Tf\n")
      var px = 0.0; var py = 0.0
      placements.foreach { case (x, y, t) =>
        body.append(num(x - px)).append(' ').append(num(y - py))
          .append(" Td (").append(esc(t)).append(") Tj\n")
        px = x; py = y
      }
      body.append("ET\n")
      if (withImage) body.append("q 20 0 0 20 500 50 cm /Im0 Do Q\n")
      val raw = body.toString.getBytes(ISO_8859_1)
      val (data, filter) =
        if (flate) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      objs(contNum) =
        (s"<< /Length ${data.length}$filter >>\nstream\n").getBytes(ISO_8859_1) ++
          data ++ "\nendstream".getBytes(ISO_8859_1)
    }

    // objStm mode: move every dict-only object into one compressed
    // object stream; content/image streams stay top-level. stmIndex
    // records each packed object's position for the type-2 xref
    // entries below.
    var stmNum = -1
    val stmIndex = scala.collection.mutable.Map.empty[Int, Int]
    val emitted: Seq[(Int, Array[Byte])] =
      if (!objStm) objs.toSeq.sortBy(_._1)
      else {
        val (streamObjs, dictObjs) = objs.toSeq.sortBy(_._1).partition {
          case (_, body) => new String(body, ISO_8859_1).contains("stream")
        }
        val header = new StringBuilder
        val bodies = new StringBuilder
        dictObjs.zipWithIndex.foreach { case ((n, body), idx) =>
          stmIndex(n) = idx
          header.append(n).append(' ').append(bodies.length).append(' ')
          bodies.append(new String(body, ISO_8859_1)).append('\n')
        }
        val first = header.length
        val payload = (header.toString + bodies).getBytes(ISO_8859_1)
        val data = deflate(payload)
        stmNum = objs.keys.max + 1
        val stmBody =
          (s"<< /Type /ObjStm /N ${dictObjs.length} /First $first " +
            s"/Length ${data.length} /Filter /FlateDecode >>\nstream\n")
            .getBytes(ISO_8859_1) ++ data ++ "\nendstream".getBytes(ISO_8859_1)
        streamObjs :+ (stmNum -> stmBody)
      }

    val out = new java.io.ByteArrayOutputStream()
    out.write((if (objStm) "%PDF-1.5\n" else "%PDF-1.4\n").getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    emitted.foreach { case (num, body) =>
      offsets(num) = out.size()
      out.write(s"$num 0 obj\n".getBytes(ISO_8859_1))
      out.write(body)
      out.write("\nendobj\n".getBytes(ISO_8859_1))
    }
    if (!objStm) {
      val maxNum = emitted.map(_._1).max
      val xrefPos = out.size()
      val sb = new StringBuilder(s"xref\n0 ${maxNum + 1}\n0000000000 65535 f \n")
      (1 to maxNum).foreach { n =>
        sb.append(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")
      }
      sb.append(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R >>\n")
      sb.append(s"startxref\n$xrefPos\n%%EOF\n")
      out.write(sb.toString.getBytes(ISO_8859_1))
    } else {
      // PDF 1.5 files MUST reference compressed objects through a
      // cross-reference STREAM (ISO 32000 §7.5.8): type-1 entries for
      // top-level objects, type-2 (stream number, index) for objects
      // living inside the ObjStm, the xref stream itself included.
      // A classic xref can't express type 2 — writing one with fake
      // offsets would be a structurally invalid file.
      val xrefNum = emitted.map(_._1).max + 1
      val xrefPos = out.size()
      val size = xrefNum + 1
      val entries = new java.io.ByteArrayOutputStream()
      def entry(t: Int, f2: Int, f3: Int): Unit = { // W = [1 4 2]
        entries.write(t)
        entries.write((f2 >>> 24) & 0xFF); entries.write((f2 >>> 16) & 0xFF)
        entries.write((f2 >>> 8) & 0xFF); entries.write(f2 & 0xFF)
        entries.write((f3 >>> 8) & 0xFF); entries.write(f3 & 0xFF)
      }
      entry(0, 0, 0xFFFF) // object 0: the free-list head
      (1 until size).foreach { n =>
        if (n == xrefNum) entry(1, xrefPos, 0)
        else if (offsets.contains(n)) entry(1, offsets(n), 0)
        else if (stmIndex.contains(n)) entry(2, stmNum, stmIndex(n))
        else entry(0, 0, 0xFFFF)
      }
      val data = entries.toByteArray
      out.write((s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [ 1 4 2 ] " +
        s"/Root 1 0 R /Length ${data.length} >>\nstream\n").getBytes(ISO_8859_1))
      out.write(data)
      out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
      out.write(s"startxref\n$xrefPos\n%%EOF\n".getBytes(ISO_8859_1))
    }
    out.toByteArray
  }
}
