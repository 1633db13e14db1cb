package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.model.{Doc, Span}
import graft.parse.OcrXmlParser
import graft.stages.{ExtractConfig, Extraction, RegexRule}
import graft.text.TextRules

/** Stored golden span-sequence equality (BASELINE.json per-row
  * invariant): the Spark pipeline's output for each reference fixture
  * must equal the committed golden `(kind, text, media_ref, order)`
  * sequence byte-for-byte. */
class GoldenSpanSpec extends SparkSpecBase {

  private val goldenDir = Paths.get("src/test/resources/golden")
  private val resDir = Paths.get("/root/reference/tests/resources")

  private def readGolden(name: String): Seq[(String, String, String, Int)] =
    Files.readAllLines(goldenDir.resolve(s"$name.tsv")).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l =>
        val Array(k, t, r, o) = l.split("\t", 4)
        val unesc = t.replace("\\r", "\r").replace("\\n", "\n")
          .replace("\\t", "\t").replace("\\\\", "\\")
        (k, unesc, r, o.toInt)
      }

  DumpGolden.fixtures.foreach { name =>
    test(s"golden span sequence: $name") {
      assume(Files.isReadable(resDir.resolve(s"$name.xml")))
      assume(Files.isReadable(goldenDir.resolve(s"$name.tsv")))
      import spark.implicits._
      val xml = new String(Files.readAllBytes(resDir.resolve(s"$name.xml")),
        java.nio.charset.StandardCharsets.UTF_8)
      val doc = Doc(name, OcrXmlParser.toSpans(name, new OcrXmlParser().parse(xml)))
      val cfg = ExtractConfig(
        replaceDict = TextRules.FixtureReplaceDict,
        regexRule = Some(RegexRule("([aeioubcglnt]3[:-]*\")", "3", "s")))
      val out = Extraction.pipeline(Seq(doc).toDF(), cfg).collect().head
      val got = out.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      assert(got == readGolden(name), s"span sequence mismatch for $name")
    }
  }
}
