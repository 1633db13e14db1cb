package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.text.TextRules

/** Property-based invariants for the sanitize/wrap rules (SURVEY.md §5
  * test plan). Runs under sbt's native ScalaCheck framework. */
object TextRulesProps extends Properties("TextRules") {

  private val token: Gen[String] =
    Gen.oneOf(
      Gen.alphaStr.map(_.take(10)),
      Gen.oneOf("ſ", "iſt.", "a3\"", "1849", "..", "a", "-", "Wort-", "  ", ""),
      Gen.listOfN(5, Gen.oneOf(('a' to 'z') ++ TextRules.BadChars)).map(_.mkString))

  private val line: Gen[String] =
    Gen.listOf(token).map(_.mkString(" "))

  private val lines: Gen[List[String]] = Gen.listOf(line)

  property("sanitizeChars removes every bad char and short token") = forAll(line) { l =>
    val out = TextRules.sanitizeChars(l)
    val noBad = out.forall(c => !TextRules.BadChars.contains(c) && c != 'ſ')
    val noShort = TextRules.splitWs(out).forall(_.length > 1)
    noBad && noShort
  }

  property("sanitizeChars is idempotent") = forAll(line) { l =>
    val once = TextRules.sanitizeChars(l)
    TextRules.sanitizeChars(once) == once
  }

  property("sanitizeWraps without hyphen endings is the identity") =
    forAll(lines.map(_.map(_.replace("-", "")))) { ls =>
      TextRules.sanitizeWraps(ls) == ((ls.toVector, 0))
    }

  property("sanitizeWraps never grows the line count") = forAll(lines) { ls =>
    TextRules.sanitizeWraps(ls)._1.size <= ls.size
  }

  property("textlinesToData counters are consistent") = forAll(lines) { ls =>
    val (_, nIn, _, nShorts, nOut) = TextRules.textlinesToData(ls)
    val nonEmpty = ls.count(_.nonEmpty)
    val (wrapped, _) = TextRules.sanitizeWraps(ls.filter(_.nonEmpty))
    nIn == ls.length && nOut + nShorts == wrapped.size && nOut >= 0 && nonEmpty >= 0
  }

  property("binIndex is clamped to [0, bins-1] for non-negative ratios") =
    forAll(Gen.choose(0.0, 1000.0)) { r =>
      val b = TextRules.binIndex(r)
      b >= 0 && b <= 4
    }

  property("analyze bins partition the inputs") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 120.0))) { rs =>
      TextRules.analyze(rs).exists(_._2.sum == rs.size)
    }

  property("pyRound(x,3) is within 5e-4 of x") =
    forAll(Gen.choose(-1000.0, 1000.0)) { x =>
      math.abs(TextRules.pyRound(x, 3) - x) <= 5.001e-4
    }

  property("hitRatio is in [0,100] and errors clamped") =
    forAll(Gen.choose(0, 10000), Gen.choose(0, 20000)) { (w, e) =>
      val (r, errs) = TextRules.hitRatio(w, e)
      r >= 0.0 && r <= 100.0 && errs <= w
    }

  property("replaceChars with empty dict is identity") = forAll(line) { l =>
    TextRules.replaceChars(l, Nil) == ((l, Nil))
  }

  property("corpus generator is deterministic") =
    forAll(Gen.choose(0L, 100000L), Gen.oneOf("uniform", "interleaved", "skewed", "edge")) {
      (i, p) =>
        graft.gen.CorpusGen.genDoc(i, p, 42L, 1000) ==
          graft.gen.CorpusGen.genDoc(i, p, 42L, 1000)
    }
}
