package graft.run

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Doc, Span}
import graft.parse.{HtmlExtract, OcrXmlParser, ParserPool, PdfExtract}

/** Unified multi-format ingestion: one distributed scan over a corpus
  * mixing ALTO/PAGE XML, HTML and PDF documents, dispatched per row by
  * MAGIC BYTES (the X1 namespace-sniff generalized across container
  * formats — extensions lie on web corpora) to the matching pooled
  * parser, all emitting the same canonical span table. Files are read
  * with the `binaryFile` source (one row per file, content as bytes —
  * works for text and binary payloads alike); parse failures become
  * `kind='error'` rows and tick the failure accumulator, never
  * aborting the job.
  *
  * Usage: IngestAny <dir[,dir…]> <outParquet>
  */
object IngestAny {

  sealed trait Format
  case object FmtXml extends Format
  case object FmtHtml extends Format
  case object FmtPdf extends Format
  case object FmtUnknown extends Format

  /** Magic-byte / prologue sniff on the first bytes of the payload. */
  def sniff(bytes: Array[Byte]): Format = {
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F') return FmtPdf
    val head = new String(bytes, 0, math.min(bytes.length, 512),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    val t = head.dropWhile(c => c.isWhitespace || c == '﻿')
    if (t.startsWith("<!doctype html") || t.startsWith("<html")) FmtHtml
    else if (t.startsWith("<?xml") || t.startsWith("<alto") || t.startsWith("<pcgts"))
      FmtXml
    else if (t.contains("<html") || t.contains("<body")) FmtHtml
    else FmtUnknown
  }

  /** Distributed dispatch-parse of (doc_id, content) rows. */
  def parseDocs(raw: Dataset[(String, Array[Byte])]): Dataset[Doc] = {
    val sc = raw.sparkSession.sparkContext
    val docsParsed = sc.longAccumulator("graft.docs_parsed")
    val spansEmitted = sc.longAccumulator("graft.spans_emitted")
    val parseFailures = sc.longAccumulator("graft.parse_failures")
    import raw.sparkSession.implicits._
    raw.mapPartitions { it =>
      val xmlParser = ParserPool.get() // pooled per task, never per row
      it.map { case (docId, bytes) =>
        try {
          val spans = sniff(bytes) match {
            case FmtPdf => PdfExtract.extract(bytes, docId)
            case FmtHtml =>
              HtmlExtract.extract(
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8), docId).spans
            case FmtXml =>
              OcrXmlParser.toSpans(docId, xmlParser.parse(
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
            case FmtUnknown =>
              throw new IllegalArgumentException("unrecognized format")
          }
          docsParsed.add(1)
          spansEmitted.add(spans.length)
          Doc(docId, spans)
        } catch {
          case e: Exception =>
            parseFailures.add(1)
            Doc(docId, Vector(Span(IngestXml.KindError,
              Option(e.getMessage).getOrElse(""), "", 0)))
        }
      }
    }
  }

  /** Multi-root recursive binary scan (S1/S2/S3 over mixed formats). */
  def readFiles(spark: SparkSession, paths: Seq[String],
      glob: String = "*.{xml,html,htm,pdf}"): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(paths: _*)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[A-Za-z0-9]+$", 1).as("doc_id"),
        col("content"))
      .as[(String, Array[Byte])]
  }

  def main(args: Array[String]): Unit = {
    val Array(inDirs, outPath) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-any")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val raw = readFiles(spark,
      inDirs.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty))
    val docs = parseDocs(raw)
    docs.write.mode("overwrite").parquet(outPath)

    docs.map(d => (d.doc_id, d.spans.length,
        d.spans.count(_.kind == Span.KindText),
        d.spans.count(_.kind == Span.KindMedia),
        d.spans.count(_.kind == IngestXml.KindError)))
      .toDF("doc_id", "n_spans", "n_text", "n_media", "n_err")
      .orderBy("doc_id")
      .show(100, truncate = false)
    spark.stop()
  }
}
