package graft.gen

import java.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Doc, Span}

/** Deterministic synthetic corpus generator for the interleaved
  * text+media span table (FIXTURES.md §1 profiles). Seeded per
  * document (`seed ^ mix64(docId)`), so generation is reproducible,
  * order-independent, and embarrassingly parallel — the generator runs
  * as a narrow map over `spark.range`, scaling to any corpus size with
  * zero shuffle and no driver materialization.
  */
object CorpusGen {

  /** Fraktur-flavored vocabulary: includes the sanitize alphabet's
    * special cases — `ſ`, the OCR confusion `ic)`, digits, punctuation
    * from BadChars, short tokens, RTL marks. */
  private val vocab: Array[String] = Array(
    "Die", "Verſammlung", "der", "Stadt", "und", "das", "Zeitung",
    "geweſen", "iſt", "Beſtätigt", "Nachrich)t", "Königl", "Preuß",
    "Anzeiger", "1849", "Seite", "Nr", "auf", "mit", "von", "zu",
    "Herr", "Bürgermeiſter", "e3\"", "a3-\"", "wurde", "haben",
    "Gericht", "ſeine", "Landes", "October", "Berlin", "Leipzig",
    "a", "I", "—", "preiſe", "Thaler", "gr", "viertel", "Jahr",
    "(Amtlich)", "ſich", "nicht", "oder", "dieſe", "welche", "nach")

  private val rtlMarks = Array("\u200f", "\u200e", "\ufeff")

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Generate one document, purely from (id, profile, seed). */
  def genDoc(id: Long, profile: String, seed: Long, megaSpans: Int): Doc = {
    val rng = new Random(seed ^ mix64(id))
    val docId = f"doc_$id%012d"

    val (nLines, mediaPct) = profile match {
      case "uniform"     => (2 + rng.nextInt(20), 0.0)
      case "interleaved" => (2 + rng.nextInt(20), 0.05 + rng.nextDouble() * 0.10)
      case "skewed" =>
        // Zipf-ish: ~1/1000 docs are mega-documents (large newspapers).
        // NOTE `megaSpans` is a LINE budget divided by 8, and each line
        // emits ~4.55 spans on average — a mega-doc therefore carries
        // ~0.57 × megaSpans actual spans (megaSpans=50000 → ~28k). The
        // formula is kept as-is so bench corpora stay byte-identical
        // across rounds; size interpretation documented here and in
        // BENCH.md rather than silently rescaled.
        if (mix64(id * 31 + 7) % 1000 == 0) (megaSpans / 8, 0.05)
        else (1 + rng.nextInt(8), 0.05)
      case "edge"        => (rng.nextInt(4), 0.10) // includes empty docs
      case other => throw new IllegalArgumentException(s"unknown profile $other")
    }

    val spans = Vector.newBuilder[Span]
    var off = 0
    var mediaN = 0
    var line = 0
    while (line < nLines) {
      val lineRef = s"${Span.LineRefPrefix}b${line / 4}/l$line"
      val nWords = 1 + rng.nextInt(8)
      var w = 0
      while (w < nWords) {
        var tok = vocab(rng.nextInt(vocab.length))
        if (profile == "edge") {
          val r = rng.nextInt(10)
          if (r == 0) tok = "   "                         // whitespace-only span
          else if (r == 1) tok = rtlMarks(rng.nextInt(3)) + tok // RTL-marked
          else if (r == 2) tok = ""                       // blank span
        }
        // occasional hyphen-ended last word → exercises wrap merge
        if (w == nWords - 1 && rng.nextInt(5) == 0) tok = tok + "-"
        spans += Span(Span.KindText, tok, lineRef, off)
        off += 1
        w += 1
      }
      if (rng.nextDouble() < mediaPct) {
        spans += Span.media(s"media://$docId/$mediaN", off)
        off += 1; mediaN += 1
      }
      line += 1
    }
    Doc(docId, spans.result())
  }

  /** Distributed generation of `n` documents. */
  def docs(spark: SparkSession, n: Long, profile: String = "interleaved",
      seed: Long = 42L, megaSpans: Int = 100000): Dataset[Doc] = {
    import spark.implicits._
    spark.range(n).mapPartitions { it =>
      it.map(i => genDoc(i, profile, seed, megaSpans))
    }
  }
}
