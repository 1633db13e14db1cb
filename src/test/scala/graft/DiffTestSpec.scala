package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextRules

/** Cross-language differential test: 600 seeded random line lists were
  * run through a faithful Python replica of the reference's
  * textlines2data chain (tools/gen_difftest.py — same in-place
  * mutation and drop quirks as lib/ocr_step.py:449-514); the Scala
  * rules must reproduce every output exactly. */
class DiffTestSpec extends AnyFunSuite {

  // minimal JSON reader for the fixture shape (array of flat objects
  // with string-array + string + int fields) — avoids a JSON dep
  private def parseCases(json: String): Seq[(Vector[String], String, Int, Int, Int, Int)] = {
    val p = new JsonParser(json)
    p.parseArray().map { obj =>
      val m = obj.asInstanceOf[Map[String, Any]]
      (m("lines").asInstanceOf[Vector[Any]].map(_.asInstanceOf[String]),
        m("word_string").asInstanceOf[String],
        m("n_lines_in").asInstanceOf[Double].toInt,
        m("n_wraps").asInstanceOf[Double].toInt,
        m("n_shorts").asInstanceOf[Double].toInt,
        m("n_lines_out").asInstanceOf[Double].toInt)
    }
  }

  test("600 random cases match the Python reference replica exactly") {
    val path = Paths.get("src/test/resources/difftest/textlines_cases.json")
    assume(Files.isReadable(path))
    val cases = parseCases(new String(Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(cases.size == 600)
    cases.zipWithIndex.foreach { case ((lines, ws, nIn, nWraps, nShorts, nOut), i) =>
      val (gWs, gIn, gWraps, gShorts, gOut) = TextRules.textlinesToData(lines)
      assert(gWs == ws, s"case $i word_string: lines=$lines")
      assert((gIn, gWraps, gShorts, gOut) == ((nIn, nWraps, nShorts, nOut)),
        s"case $i counters: lines=$lines")
    }
  }
}

/** Tiny recursive-descent JSON parser sufficient for the fixture file
  * (objects, arrays, strings with escapes, numbers, booleans, null). */
private[graft] final class JsonParser(s: String) {
  private var i = 0
  private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
  private def expect(c: Char): Unit = { ws(); require(s.charAt(i) == c, s"at $i: ${s.charAt(i)} != $c"); i += 1 }

  def parseArray(): Vector[Any] = { ws(); parseValue().asInstanceOf[Vector[Any]] }

  private def parseValue(): Any = {
    ws()
    s.charAt(i) match {
      case '[' =>
        i += 1; ws()
        val b = Vector.newBuilder[Any]
        if (s.charAt(i) == ']') { i += 1; return b.result() }
        var done = false
        while (!done) {
          b += parseValue(); ws()
          if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
        }
        b.result()
      case '{' =>
        i += 1; ws()
        val m = Map.newBuilder[String, Any]
        if (s.charAt(i) == '}') { i += 1; return m.result() }
        var done = false
        while (!done) {
          ws()
          val k = parseString()
          expect(':')
          m += (k -> parseValue()); ws()
          if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
        }
        m.result()
      case '"' => parseString()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ =>
        val start = i
        while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
        s.substring(start, i).toDouble
    }
  }

  private def parseString(): String = {
    expect('"')
    val sb = new java.lang.StringBuilder
    while (s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }
    i += 1
    sb.toString
  }
}
