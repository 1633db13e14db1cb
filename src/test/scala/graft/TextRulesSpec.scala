package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextRules

/** Ports of the reference's pure-function unit tests
  * (/root/reference/tests/test_steps.py). */
class TextRulesSpec extends AnyFunSuite {

  // test_steps.py:209-231 — literal replace over 3 ALTO raw lines
  test("replaceChars replaces all occurrences per line, dict order") {
    val dict = Seq("ſ" -> "s", "ic)" -> "ich")
    val lines = Seq(
      """<String ID="string_405" WC="0.96" CONTENT="geweſen"/>""",
      """<String ID="string_406" WC="0.95" CONTENT="iſt."/>""",
      """<String ID="string_407" WC="0.96" CONTENT="Beſtätigt"/>""")
    val out = lines.map(l => TextRules.replaceChars(l, dict))
    assert(out.size == 3)
    assert(!out(1)._1.contains("iſt."))
    assert(out(1)._1.contains("ist."))
    assert(out(0)._2 == Seq("ſ"))
  }

  test("replaceChars dict order matters (prod dict)") {
    // conf/ocr_config.ini:24 {'ic)':'ich','s<':'sc','<':'c'}
    val (out, hits) = TextRules.replaceChars("mus< i<) s<on", TextRules.DefaultReplaceDict)
    // 'ic)' absent; 's<'→'sc' first, then remaining '<'→'c'
    assert(out == "musc ic) scon")
    assert(hits == Seq("s<", "<"))
  }

  // lib/ocr_step.py:283-292 — first-match group replace
  test("regexGroupReplace first match only, all copies replaced") {
    val (out, stat) =
      TextRules.regexGroupReplace("""ein g3" und noch ein g3" und ein t3-"""",
        TextRules.FixtureRegex, "3", "s")
    // first match g3" → gs", both copies of the matched literal replaced;
    // t3-" untouched (different literal)
    assert(out == """ein gs" und noch ein gs" und ein t3-"""")
    assert(stat.contains("g3\"=>gs\""))
  }

  test("regexGroupReplace no match") {
    val (out, stat) = TextRules.regexGroupReplace("nichts hier",
      TextRules.FixtureRegex, "3", "s")
    assert(out == "nichts hier" && stat.isEmpty)
  }

  // lib/ocr_step.py:472-494 — wrap merge quirks
  test("sanitizeWraps merges hyphenated line into next line's first token") {
    val (out, n) = TextRules.sanitizeWraps(Seq("Die Verſamm-", "lung der Stadt", "Ende"))
    assert(out == Vector("Die Verſammlung", "der Stadt", "Ende"))
    assert(n == 1)
  }

  test("sanitizeWraps chain: rewritten next line participates") {
    // line 1 eats 'b-' from line 2; line 2 (now 'b-'→ wait) —
    // replicate python step-by-step: ["a-", "b- c", "d"]
    //  i=0: ends '-', next "b- c" → first tok 'b-', line→'ab-', next→'c'
    //  i=1: line 'c' (mutated), no '-' → kept
    val (out, n) = TextRules.sanitizeWraps(Seq("a-", "b- c", "d"))
    assert(out == Vector("ab-", "c", "d"))
    assert(n == 1)
  }

  test("sanitizeWraps drops hyphen line before empty next line") {
    val (out, n) = TextRules.sanitizeWraps(Seq("Wort-", "   ", "Ende"))
    assert(out == Vector("   ", "Ende"))
    assert(n == 0)
  }

  test("sanitizeWraps single-token next line becomes empty") {
    val (out, n) = TextRules.sanitizeWraps(Seq("Wort-", "rest", "Ende"))
    assert(out == Vector("Wortrest", "", "Ende"))
    assert(n == 1)
  }

  test("sanitizeWraps last line hyphen kept as-is") {
    val (out, n) = TextRules.sanitizeWraps(Seq("Ende-"))
    assert(out == Vector("Ende-") && n == 0)
  }

  // lib/ocr_step.py:497-514 — char sanitize
  test("sanitizeChars removes bad chars, maps long s, drops short tokens") {
    assert(TextRules.sanitizeChars("  Die Verſammlung; 1849 \"und\" (ich) a b  ") ==
      "Die Versammlung und ich")
    assert(TextRules.sanitizeChars("a1b2c3") == "abc")
    assert(TextRules.sanitizeChars("..") == "")
    assert(TextRules.sanitizeChars("x") == "")
  }

  // lib/ocr_step.py:397-412 — ratio math (fixture: 2636 words / 548 errs)
  test("hitRatio fixture value 79.211") {
    val (ratio, errs) = TextRules.hitRatio(2636, 548)
    assert(errs == 548)
    assert(ratio == 79.211)
  }

  test("hitRatio clamps errors and floors at zero") {
    assert(TextRules.hitRatio(10, 25) == ((0.0, 10)))
    assert(TextRules.hitRatio(0, 0) == ((0.0, 0)))
  }

  // test_steps.py:369-396 — analyze fixture
  test("analyze mean 42.723 and bins [1,2,3,1,3]") {
    val ratios = Seq(14.123, 18.123, 28.123, 38.123, 40.123,
      41.123, 51.123, 60.123, 68.123, 68.123)
    val Some((mean, bins)) = TextRules.analyze(ratios)
    assert(mean == 42.723)
    assert(bins == Vector(1L, 2L, 3L, 1L, 3L))
  }

  // test_steps.py:399-422 — border cases incl. 0 and >100
  test("analyze border case mean 49.677 and bins [1,1,1,1,2]") {
    val ratios = Seq(0.0, 28.123, 41.123, 50.123, 78.571, 100.123)
    val Some((mean, bins)) = TextRules.analyze(ratios)
    assert(mean == 49.677)
    assert(bins == Vector(1L, 1L, 1L, 1L, 2L))
  }

  test("analyze empty input") {
    assert(TextRules.analyze(Nil).isEmpty)
  }

  test("stripMarks removes the five directional/BOM marks") {
    assert(TextRules.stripMarks("\u200fab\u200e\ufeff\u200ccd\u202c") == "abcd")
    assert(TextRules.stripMarks("plain") == "plain")
  }

  test("pyRound matches Python round-half-even") {
    assert(TextRules.pyRound(0.5, 0) == 0.0)
    assert(TextRules.pyRound(1.5, 0) == 2.0)
    assert(TextRules.pyRound(2.675, 2) == 2.67) // binary double below 2.675
    assert(TextRules.pyRound(42.7230, 3) == 42.723)
  }
}
