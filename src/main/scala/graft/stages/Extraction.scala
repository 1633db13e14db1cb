package graft.stages

import java.util.regex.Pattern

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Doc, Estimation, EstimationReport, Line, Span}
import graft.sql.SpanOps
import graft.text.TextRules

/** One regex replacement rule (C2, lib/ocr_step.py:273-292). */
final case class RegexRule(pattern: String, old: String, nw: String) {
  @transient lazy val compiled: Pattern = Pattern.compile(pattern)
}

/** Configuration of the extraction pipeline — the engine twin of the
  * reference's ordered `step_NN` ini sections (ocr_pipeline.py:101-118).
  */
final case class ExtractConfig(
    replaceDict: Seq[(String, String)] = TextRules.DefaultReplaceDict,
    regexRule: Option[RegexRule] = None,
    minLineLen: Int = 2,   // get_lines min_len (lib/ocr_model.py:203)
    denseMinLen: Int = 2,  // textlines2data minlen (lib/ocr_step.py:449)
    reorderRtl: Boolean = false,
    pagePrefix: String = "p") // StepPostprocessALTO page_prefix (lib/ocr_step.py:552)

/** A document row after the full stage chain: cleaned spans plus the
  * per-document estimation record and the replacement statistics
  * (A1/A2, lib/ocr_step.py:255-268 — keys that occurred mapped to
  * their per-span hit counts; regex stats keyed `match=>replacement`).
  */
final case class ProcessedDoc(
    doc_id: String,
    spans: Seq[Span],
    page_id: String,
    file_identifier: String,
    file_name: String,
    hit_ratio: Double,
    n_words: Int,
    n_errs: Int,
    n_lines_in: Int,
    n_wraps: Int,
    n_shorts: Int,
    n_lines_out: Int,
    repl_stats: Map[String, Int] = Map.empty)

/** Internal row shape of the HOF twin: cleaned spans for estimation +
  * the raw pre-replacement spans for the stats pass. */
private[stages] final case class CleanedWithRaw(
    doc_id: String, spans: Seq[Span], raw_spans: Seq[Span])

/** The extraction pipeline: the reference's per-document step chain
  * (ocr_pipeline.py:379-441 with conf/ocr_config.ini:15-37) re-expressed
  * as a composition of narrow Spark stages over `Dataset[Doc]`.
  *
  * Execution shape (100 TB story): every stage is per-row (per-doc) —
  * there is NO shuffle anywhere in the chain; Catalyst fuses the
  * column stages into one whole-stage-codegen pass and the estimate
  * stage is a single narrow typed `mapPartitions`. The only shuffle in
  * the whole job is the final tiny corpus aggregate. Mega-doc skew is
  * handled by spreading docs uniformly (repartition on doc_id hash)
  * before the chain plus AQE; a 10^5-span doc is one task among many,
  * never a hot partition.
  */
object Extraction {

  /** Default row cap for the driver-streamed [[writeWtr]] compat sink
    * (~10M lines ≈ a few hundred MB of text — the most one driver
    * writer should ever be asked to stream). */
  val WtrMaxRows: Long = 10L * 1000 * 1000

  /** Column stage chain C1 → (C2) → F6 → S8: replace, regex-replace,
    * blank-span drop, offset re-sort — all Catalyst HOFs, codegen'd,
    * narrow. */
  def spanColumnStage(cfg: ExtractConfig)(spans: Column): Column = {
    val replaced = SpanOps.replaceChars(spans, cfg.replaceDict)
    val afterRegex = cfg.regexRule match {
      case Some(r) => regexStageCol(replaced, r)
      case None    => replaced
    }
    SpanOps.sortByOffset(SpanOps.dropBlank(afterRegex))
  }

  /** C2 as a column op. Spark's `regexp_replace` cannot express
    * "extract group-1 of the FIRST match, literal-replace inside it,
    * then replace all copies of the matched literal" — compose
    * regexp_extract + replace instead (SURVEY.md §2.8 C2). */
  def regexStageCol(spans: Column, rule: RegexRule): Column =
    SpanOps.mapText(spans) { t =>
      val m = regexp_extract(t, rule.pattern, 1)
      when(m === "", t)
        .otherwise(replace(t, m, replace(m, lit(rule.old), lit(rule.nw))))
    }

  /** Group consecutive cleaned text spans into lines by their
    * `line://` parent ref, preserving order — the engine's `get_lines`
    * (lib/ocr_model.py:203-214). Media/error spans are skipped. */
  def toLines(spans: Seq[Span], minLineLen: Int, reorder: Boolean): Vector[Line] = {
    val lines = Vector.newBuilder[Line]
    var curKey: String = null
    var started = false // a null line key still forms a group (the
    // ProcessSpans codegen twin groups null keys too — using null as
    // the 'no group yet' sentinel here silently dropped those spans)
    var curWords = Vector.newBuilder[String]
    def flush(): Unit = if (started) {
      val words = curWords.result()
      if (words.mkString(" ").length >= minLineLen)
        lines += Line(curKey, words, reorder)
    }
    spans.foreach { s =>
      if (s.kind == Span.KindText) {
        val key = Span.lineKey(s.media_ref)
        if (!started || key != curKey) {
          flush(); curKey = key; curWords = Vector.newBuilder[String]; started = true
        }
        curWords += s.text
      }
    }
    flush()
    lines.result()
  }

  /** Per-document estimation (StepEstimateOCR, lib/ocr_step.py:337-424):
    * line model → wrap merge → sanitize → dense filter → word/error
    * counts → hit ratio. `errorOracle` is the deterministic stand-in
    * for the LanguageTool service (E2): word string → raw error count.
    */
  def estimateDoc(doc: Doc, cfg: ExtractConfig,
      errorOracle: String => Int = TextRules.countErrors): ProcessedDoc = {
    val lines = toLines(doc.spans, cfg.minLineLen, cfg.reorderRtl)
    var ratio = Estimation.MissingRatio
    var nWords = 0; var nErrs = 0
    var nIn = 0; var nWraps = 0; var nShorts = 0; var nOut = 0
    if (lines.nonEmpty) {
      val (wordString, in, wraps, shorts, out) =
        TextRules.textlinesToData(lines.map(_.content), cfg.denseMinLen)
      if (wordString.nonEmpty) {
        nIn = in; nWraps = wraps; nShorts = shorts; nOut = out
        nWords = TextRules.splitWs(wordString).length
        val (r, e) = TextRules.hitRatio(nWords, errorOracle(wordString))
        ratio = r; nErrs = e
      }
    }
    // X4 metadata enrichment (lib/ocr_step.py:539-549): identifier =
    // id up to the first dot (split_path semantics), name = full id
    // substring_index semantics, matching the codegen twin exactly:
    // split("\\.")(0) drops trailing empties and would throw on a
    // doc_id of only dots where the twin returns ""
    val fileId = {
      val dot = doc.doc_id.indexOf('.')
      if (dot < 0) doc.doc_id else doc.doc_id.substring(0, dot)
    }
    ProcessedDoc(doc.doc_id, doc.spans, cfg.pagePrefix + fileId,
      fileId, doc.doc_id, ratio, nWords, nErrs, nIn, nWraps, nShorts, nOut)
  }

  /** A1/A2 replacement statistics of one document's raw spans — the
    * pure twin of the stats the ProcessSpans expression computes
    * inline (lib/ocr_step.py:255-268; each key counts once per span
    * in which it occurred, regex keys are `match=>replacement`). */
  def replStatsOf(spans: Seq[Span], cfg: ExtractConfig): Map[String, Int] = {
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    spans.foreach { s =>
      if (s.kind == Span.KindText) {
        val (t1, hits) = TextRules.replaceChars(s.text, cfg.replaceDict)
        hits.foreach(k => stats.update(k, stats.getOrElse(k, 0) + 1))
        cfg.regexRule.foreach { r =>
          val (_, stat) = TextRules.regexGroupReplace(t1, r.compiled, r.old, r.nw)
          stat.foreach(k => stats.update(k, stats.getOrElse(k, 0) + 1))
        }
      }
    }
    stats.toMap
  }

  /** Full pipeline over a span table. Input: DataFrame with columns
    * (doc_id, spans). Output: Dataset[ProcessedDoc].
    *
    * Hot path: ONE custom Catalyst expression ([[graft.sql.ProcessSpans]])
    * does the whole per-doc chain over raw ArrayData — no interpreted
    * HOF chain, no encoder round-trip. RTL-reorder configs (W2) run on
    * the same path via `ProcessConfig.reorderRtl`. */
  def pipeline(docs: DataFrame, cfg: ExtractConfig = ExtractConfig()): Dataset[ProcessedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pcfg = graft.sql.ProcessConfig(
      cfg.replaceDict,
      cfg.regexRule.map(r => (r.pattern, r.old, r.nw)),
      cfg.minLineLen, cfg.denseMinLen, cfg.reorderRtl)
    docs
      .select(col("doc_id"),
        graft.sql.ProcessSpans.process(col("spans"), pcfg).as("p"))
      .select(col("doc_id"), col("p.spans").as("spans"),
        concat(lit(cfg.pagePrefix), substring_index(col("doc_id"), ".", 1)).as("page_id"),
        substring_index(col("doc_id"), ".", 1).as("file_identifier"),
        col("doc_id").as("file_name"),
        col("p.hit_ratio"), col("p.n_words"), col("p.n_errs"),
        col("p.n_lines_in"), col("p.n_wraps"), col("p.n_shorts"),
        col("p.n_lines_out"), col("p.repl_stats"))
      .as[ProcessedDoc]
  }

  /** Reference composition of built-in HOF stages + typed estimate map
    * — semantically identical to [[pipeline]]; kept as the
    * cross-validation twin (different mechanism, same spec). The raw
    * spans ride along so the stats pass sees pre-replacement text. */
  def pipelineHof(docs: DataFrame, cfg: ExtractConfig = ExtractConfig()): Dataset[ProcessedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cleaned = docs.select(
      col("doc_id"),
      spanColumnStage(cfg)(col("spans")).as("spans"),
      col("spans").as("raw_spans"))
    cleaned.as[CleanedWithRaw].mapPartitions { it =>
      it.map { d =>
        estimateDoc(Doc(d.doc_id, d.spans), cfg)
          .copy(repl_stats = replStatsOf(d.raw_spans, cfg))
      }
    }
  }

  /** Corpus-level replacement statistics (the reference logs these per
    * file at ocr_pipeline.py:402-411; here one tiny aggregate over the
    * per-doc maps): key → total hits, descending. */
  def corpusReplStats(processed: Dataset[ProcessedDoc]): DataFrame =
    processed.select(explode(col("repl_stats")).as(Seq("key", "hits")))
      .groupBy(col("key"))
      .agg(sum(col("hits")).as("n"))
      .orderBy(desc("n"), col("key"))

  /** Attach observability metrics (E4 / north_rule "accumulator
    * metrics": docs parsed, spans emitted, parse failures) to a
    * processed stream without a second pass — read them from the
    * returned Observation after the action. */
  def observed(processed: Dataset[ProcessedDoc], name: String = "graft_metrics")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val df = processed.toDF().observe(obs,
      count(lit(1)).as("docs_parsed"),
      coalesce(sum(size(col("spans"))), lit(0L)).as("spans_emitted"),
      count(when(col("hit_ratio") === Estimation.MissingRatio, 1)).as("docs_unestimated"))
    (df, obs)
  }

  /** S11 — estimation report sink, the `.wtr` analog
    * (ocr_pipeline.py:233-269): one header row (mean + five bins +
    * totals) plus the per-doc detail sorted ascending by ratio. */
  def writeReport(processed: Dataset[ProcessedDoc], outDir: String): EstimationReport = {
    val spark = processed.sparkSession
    import spark.implicits._
    val rep = report(processed)
    Seq(rep).toDS().coalesce(1).write.mode("overwrite").parquet(s"$outDir/summary")
    processed
      .filter($"hit_ratio" =!= Estimation.MissingRatio)
      .select($"doc_id", $"hit_ratio", $"n_words", $"n_errs",
        $"n_lines_in", $"n_wraps", $"n_shorts", $"n_lines_out")
      // global sort → range-partitioned ordered files; no coalesce(1):
      // the detail is O(#docs) and must stay distributed at corpus scale
      .orderBy($"hit_ratio", $"doc_id")
      .write.mode("overwrite").option("header", "true").csv(s"$outDir/detail")
    rep
  }

  /** Python `str(float)` for the domain of 3-dp-rounded ratios in
    * [0, 100]: both CPython's repr and `java.lang.Double.toString`
    * print the shortest decimal that round-trips, and they agree on
    * this range (divergences are exponent-notation corner cases
    * outside it). */
  private def pyFloatStr(x: Double): String = java.lang.Double.toString(x)

  /** Python `f"{x:.3f}"`: fixed 3 decimals, correctly rounded
    * (half-even on the exact binary value — Java's `%.3f` rounds
    * HALF_UP and can differ on formatting ties). */
  private def py3f(x: Double): String =
    new java.math.BigDecimal(x)
      .setScale(3, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** S11 — the exact `.wtr` byte layout (ocr_pipeline.py:233-269):
    * one header line `mean,b1,b2,b3,b4,b5,n_total,n_invalid`, then the
    * VALID per-doc rows `file_name,ratio(.3f),n_words,n_errs,
    * n_lines_in,n_wraps,n_shorts,n_lines_out` ascending by ratio, then
    * one blank line. Single UTF-8 file for downstream `.wtr` parsers —
    * a per-partition/compatibility sink streamed through the driver
    * (O(#docs in this partition)); the corpus-scale distributed report
    * sink remains [[writeReport]]. Divergence noted: the reference's
    * `sorted()` is stable on arrival order for equal ratios; arrival
    * order is undefined in a distributed engine, so ties break on
    * file_name. */
  def writeWtr(processed: Dataset[ProcessedDoc], path: String,
      precomputed: Option[EstimationReport] = None,
      maxRows: Long = WtrMaxRows): EstimationReport = {
    // callers that just ran writeReport pass its result — recomputing
    // here would run the corpus-wide aggregate a second time
    val rep = precomputed.getOrElse(report(processed))
    // this sink streams every row through ONE driver writer — fine for
    // the per-partition/compat use it exists for, corpus-suicide at
    // 10^12 docs. Fail fast (before opening the file) instead of
    // grinding: the distributed report sink is writeReport.
    if (rep.n_total > maxRows)
      throw new IllegalArgumentException(
        s"writeWtr is a driver-streamed per-partition sink; refusing " +
          s"${rep.n_total} rows (cap $maxRows). Use writeReport for " +
          "corpus-scale output, or raise maxRows explicitly.")
    val spark = processed.sparkSession
    import spark.implicits._
    val rows = processed
      .filter($"hit_ratio" =!= Estimation.MissingRatio)
      .select($"file_name", $"hit_ratio", $"n_words", $"n_errs",
        $"n_lines_in", $"n_wraps", $"n_shorts", $"n_lines_out")
      .as[(String, Double, Int, Int, Int, Int, Int, Int)]
      .orderBy($"hit_ratio", $"file_name")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8))
      w.write(s"${pyFloatStr(rep.mean)},${rep.b1},${rep.b2},${rep.b3}," +
        s"${rep.b4},${rep.b5},${rep.n_total},${rep.n_invalid}\n")
      rows.toLocalIterator().forEachRemaining { r =>
        w.write(s"${r._1},${py3f(r._2)},${r._3},${r._4},${r._5},${r._6},${r._7},${r._8}\n")
      }
      w.write("\n")
      w.flush()
    } finally out.close()
    rep
  }

  /** Corpus-level estimation report (ocr_pipeline.py:233-269 +
    * StepEstimateOCR.analyze lib/ocr_step.py:426-446): mean of valid
    * hit ratios (Python-rounded), five 15-point bins, valid/invalid
    * split. One tiny aggregate — the only shuffle of the job. */
  def report(processed: Dataset[ProcessedDoc]): EstimationReport = {
    val spark = processed.sparkSession
    import spark.implicits._
    // decimal sum: exact and associative, so the mean is independent of
    // partition/merge order (a plain double sum could drift an ulp vs
    // the reference's sequential Python sum on adversarial ratios)
    val agg = processed
      .select($"hit_ratio")
      .agg(
        sum(when($"hit_ratio" =!= Estimation.MissingRatio,
          $"hit_ratio".cast("decimal(28,10)"))).as("s"),
        count(when($"hit_ratio" =!= Estimation.MissingRatio, lit(1))).as("nv"),
        count(when($"hit_ratio" === Estimation.MissingRatio, lit(1))).as("ni"),
        count(lit(1)).as("n"),
        count(when(SpanOps.binId($"hit_ratio") === 0 && $"hit_ratio" =!= -1, 1)).as("b1"),
        count(when(SpanOps.binId($"hit_ratio") === 1, 1)).as("b2"),
        count(when(SpanOps.binId($"hit_ratio") === 2, 1)).as("b3"),
        count(when(SpanOps.binId($"hit_ratio") === 3, 1)).as("b4"),
        count(when(SpanOps.binId($"hit_ratio") >= 4, 1)).as("b5"))
      .head()
    val nv = agg.getAs[Long]("nv")
    val mean =
      if (nv == 0) 0.0
      else TextRules.pyRound(
        agg.getAs[java.math.BigDecimal]("s").doubleValue() / nv, 3)
    EstimationReport(mean,
      agg.getAs[Long]("b1"), agg.getAs[Long]("b2"), agg.getAs[Long]("b3"),
      agg.getAs[Long]("b4"), agg.getAs[Long]("b5"),
      agg.getAs[Long]("n"), agg.getAs[Long]("ni"))
  }
}
