package graft

import java.nio.file.{Files, Paths}

import graft.model.{Doc, Span}
import graft.parse.OcrXmlParser
import graft.stages.{ExtractConfig, Extraction, ProcessedDoc, RegexRule}
import graft.text.TextRules

/** End-to-end pipeline semantics over Spark: the Catalyst column path
  * must produce exactly the span sequence the reference semantics
  * (pure TextRules path) dictate — span-sequence equality
  * `(kind, text, media_ref, order)` per BASELINE.json. */
class PipelineSpec extends SparkSpecBase {

  private val resDir = Paths.get("/root/reference/tests/resources")
  private def fixtureDoc(name: String): Doc = {
    val xml = new String(Files.readAllBytes(resDir.resolve(name)),
      java.nio.charset.StandardCharsets.UTF_8)
    val parsed = new OcrXmlParser().parse(xml)
    Doc(name.stripSuffix(".xml"), OcrXmlParser.toSpans(name.stripSuffix(".xml"), parsed))
  }

  /** Reference-semantics golden path, computed with the pure rules
    * (independent implementation of the same spec). */
  private def goldenSpans(doc: Doc, cfg: ExtractConfig): Seq[Span] = {
    val replaced = doc.spans.map { s =>
      if (s.kind == Span.KindText) {
        val (t1, _) = TextRules.replaceChars(s.text, cfg.replaceDict)
        val t2 = cfg.regexRule match {
          case Some(r) => TextRules.regexGroupReplace(t1, r.compiled, r.old, r.nw)._1
          case None    => t1
        }
        s.copy(text = t2)
      } else s
    }
    replaced
      .filter(s => s.kind != Span.KindText || s.text.trim.nonEmpty)
      .sortBy(_.offset)
  }

  test("span-sequence equality: Catalyst stage chain == reference semantics (500_gray00003)") {
    assume(Files.isReadable(resDir.resolve("500_gray00003.xml")))
    import spark.implicits._
    val cfg = ExtractConfig(replaceDict = TextRules.FixtureReplaceDict,
      regexRule = Some(RegexRule("([aeioubcglnt]3[:-]*\")", "3", "s")))
    val doc = fixtureDoc("500_gray00003.xml")
    val out = Extraction.pipeline(Seq(doc).toDF(), cfg).collect().head
    val golden = goldenSpans(doc, cfg)
    assert(out.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
      golden.map(s => (s.kind, s.text, s.media_ref, s.offset)))
  }

  test("span-sequence equality on generated interleaved + edge corpus") {
    import spark.implicits._
    val cfg = ExtractConfig()
    val docs = (0L until 50L).map(i =>
      graft.gen.CorpusGen.genDoc(i, if (i % 2 == 0) "interleaved" else "edge", 42L, 1000))
    val out = Extraction.pipeline(docs.toDF(), cfg)
      .collect().map(p => p.doc_id -> p.spans).toMap
    docs.foreach { d =>
      val golden = goldenSpans(d, cfg)
      assert(out(d.doc_id).map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        golden.map(s => (s.kind, s.text, s.media_ref, s.offset)), s"doc ${d.doc_id}")
    }
  }

  test("media spans pass through untouched and ordered by offset") {
    import spark.implicits._
    val doc = Doc("m1", Seq(
      Span(Span.KindText, "Wort", "line://b0/l0", 2),
      Span.media("media://m1/0", 1),
      Span(Span.KindText, "", "line://b0/l0", 0) // blank → dropped
    ))
    val out = Extraction.pipeline(Seq(doc).toDF(), ExtractConfig()).collect().head
    assert(out.spans == Seq(Span.media("media://m1/0", 1),
      Span(Span.KindText, "Wort", "line://b0/l0", 2)))
  }

  test("toLines over raw spans == reference get_lines contents (ALTO + PAGE)") {
    for (name <- Seq("500_gray00003.xml", "1667522809_J_0073_0512.xml",
        "288652.xml", "OCR-RESULT_0001.xml", "ram110.xml",
        "Lubab_alAlbab.pdf_000003.xml")) {
      assume(Files.isReadable(resDir.resolve(name)))
      val xml = new String(Files.readAllBytes(resDir.resolve(name)),
        java.nio.charset.StandardCharsets.UTF_8)
      val parsed = new OcrXmlParser().parse(xml)
      val expect = OcrXmlParser.getLines(parsed, minLen = 2).map(_.content)
      val spans = OcrXmlParser.toSpans("x", parsed)
      val got = Extraction.toLines(spans, 2, reorder = false).map(_.content)
      // toSpans applies the same PAGE treatment as getLines (centroid
      // sort, trim, mark strip), so contents agree on both dialects;
      // only the kept-line filter differs in principle (line-text
      // length vs joined-token length), not on these fixtures.
      assert(got == expect, s"fixture $name")
    }
  }

  test("pipeline surfaces reference-pinned replacement stats (ſ:392, ic):6 + regex pairs)") {
    assume(Files.isReadable(resDir.resolve("500_gray00003.xml")))
    import spark.implicits._
    val doc = fixtureDoc("500_gray00003.xml")
    // A1 literal dict (tests/test_steps.py:306 pins ſ:392, ic):6)
    val out = Extraction.pipeline(Seq(doc).toDF(),
      ExtractConfig(replaceDict = TextRules.FixtureReplaceDict)).collect().head
    assert(out.repl_stats == Map("ſ" -> 392, "ic)" -> 6))
    // A2 regex stats. The reference's pinned pairs (`a3"=>as":5`,
    // test_steps.py:331-341) match the attribute-CLOSING QUOTE of the
    // raw serialized XML — token text cannot contain that quote, so the
    // token-level twin drops the quote from the pattern; counts below
    // are independently derived from the fixture's CONTENT tokens.
    val outR = Extraction.pipeline(Seq(doc).toDF(),
      ExtractConfig(replaceDict = Nil,
        regexRule = Some(RegexRule("([aeioubcglnt]3)", "3", "s")))).collect().head
    val expected = Map(
      "a3=>as" -> 5, "u3=>us" -> 1, "e3=>es" -> 7, "l3=>ls" -> 2,
      "t3=>ts" -> 4, "c3=>cs" -> 1, "b3=>bs" -> 1, "i3=>is" -> 2,
      "g3=>gs" -> 3)
    assert(outR.repl_stats == expected)
    // corpus aggregation (the reference's per-file log roll-up)
    val agg = Extraction.corpusReplStats(Extraction.pipeline(Seq(doc, doc.copy(doc_id = "copy")).toDF(),
      ExtractConfig(replaceDict = TextRules.FixtureReplaceDict))).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg == Map("ſ" -> 784L, "ic)" -> 12L))
  }

  test("estimation counters on 500_gray00003 spans: 360 lines in, 346 out") {
    assume(Files.isReadable(resDir.resolve("500_gray00003.xml")))
    val doc = fixtureDoc("500_gray00003.xml")
    val p = Extraction.estimateDoc(doc, ExtractConfig(replaceDict = Nil))
    assert(p.n_lines_in == 360)
    assert(p.n_lines_out == 346)
    assert(p.n_words > 0)
    assert(p.hit_ratio >= 0)
  }

  test("estimation of empty / sanitized-away docs → ratio -1") {
    val empty = Doc("e", Nil)
    val p1 = Extraction.estimateDoc(empty, ExtractConfig())
    assert(p1.hit_ratio == -1.0 && p1.n_words == 0)
    // really-empty: junk that sanitizes to nothing (test_steps.py:547-569)
    val junk = Doc("j", Seq(Span(Span.KindText, "|.", "line://b/l0", 0),
      Span(Span.KindText, "-", "line://b/l1", 1)))
    val p2 = Extraction.estimateDoc(junk, ExtractConfig())
    assert(p2.hit_ratio == -1.0)
    assert(p2.n_lines_in == 0 && p2.n_lines_out == 0)
  }

  test("estimation ratio formula via injected oracle (2636 words / 548 errs → 79.211)") {
    // build a doc with exactly 2636 surviving words; oracle returns 548
    val words = Vector.tabulate(2636)(i => s"wort$i")
    val spans = words.zipWithIndex.map { case (w, i) =>
      Span(Span.KindText, w, s"line://b/l${i / 10}", i)
    }
    val p = Extraction.estimateDoc(Doc("f", spans), ExtractConfig(), _ => 548)
    assert(p.n_words == 2636)
    assert(p.n_errs == 548)
    assert(p.hit_ratio == 79.211)
  }

  test("Spark corpus report matches analyze fixture (mean 42.723, bins 1,2,3,1,3)") {
    import spark.implicits._
    val ratios = Seq(14.123, 18.123, 28.123, 38.123, 40.123,
      41.123, 51.123, 60.123, 68.123, 68.123, -1.0)
    val ds = ratios.zipWithIndex.map { case (r, i) =>
      ProcessedDoc(s"d$i", Nil, s"pd$i", s"d$i", s"d$i", r, 0, 0, 0, 0, 0, 0)
    }.toDS()
    val rep = Extraction.report(ds)
    assert(rep.mean == 42.723)
    assert((rep.b1, rep.b2, rep.b3, rep.b4, rep.b5) == ((1L, 2L, 3L, 1L, 3L)))
    assert(rep.n_total == 11 && rep.n_invalid == 1)
  }
}
