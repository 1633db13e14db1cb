package graft.run

import scala.collection.mutable

import graft.stages.{ExtractConfig, RegexRule}

/** Config-side machinery of the reference pipeline, re-created for the
  * engine: lenient dict parsing (C10, lib/ocr_step.py:197-207),
  * params→CLI rendering (C11, lib/ocr_step.py:49-55), Tesseract
  * command assembly (S13, lib/ocr_step.py:132-194) and the ini-driven
  * ordered step registry (E1, ocr_pipeline.py:101-118).
  */
object PipelineConfig {

  /** C7 — split_path (lib/ocr_step.py:41-46): (dirname, basename minus
    * everything from the FIRST dot). */
  def splitPath(path: String): (String, String) = {
    val idx = path.lastIndexOf('/')
    val dir = if (idx < 0) "" else path.substring(0, idx)
    val name = path.substring(idx + 1)
    // Python "..".split('.')[0] == "" — Java split drops trailing
    // empties and would throw on an all-dots basename
    val dot = name.indexOf('.')
    (dir, if (dot < 0) name else name.substring(0, dot))
  }

  /** C11 — dict2line (lib/ocr_step.py:49-55): ordered params map to a
    * CLI fragment; valueless keys are bare flags. */
  def dict2line(params: Seq[(String, Option[String])], glue: String): String =
    params.map {
      case (k, Some(v)) if v.nonEmpty => " " + k + glue + v
      case (k, _)                     => " " + k
    }.mkString.trim

  /** C10 — lenient dict parse (lib/ocr_step.py:197-207): `{k:v, k:v}`
    * without JSON strictness; single tokens yield an empty map. Quote
    * wrappers are stripped (the reference keeps them — a latent config
    * bug; the engine normalizes, documented divergence). */
  def parseDict(s: String): Seq[(String, String)] = {
    val body = s.replace("{", "").replace("}", "")
    val tokens = body.split(",")
    if (tokens.length <= 1) Seq.empty
    else tokens.toSeq.map { tkn =>
      // reference `tkn.split(':')[1]` (lib/ocr_step.py:203-204): the
      // value is the segment between the FIRST and SECOND colon (a
      // second colon truncates), a trailing-colon entry ('key:')
      // yields an EMPTY value (Python keeps trailing empty segments;
      // Java's default split drops them, hence limit -1), and only a
      // genuinely colon-LESS token is an IndexError — mirrored as a
      // config error, not a silent skip
      val kv = tkn.split(":", -1)
      if (kv.length < 2)
        throw new IllegalArgumentException(
          s"malformed dict entry '$tkn' (reference parse_dict raises IndexError)")
      unquote(kv(0).trim) -> unquote(kv(1).trim)
    }
  }

  private def unquote(v: String): String = {
    val r = if (v.startsWith("r'") && v.endsWith("'")) v.substring(1) else v
    if ((r.startsWith("'") && r.endsWith("'") && r.length >= 2) ||
      (r.startsWith("\"") && r.endsWith("\"") && r.length >= 2))
      r.substring(1, r.length - 1)
    else r
  }

  /** S13 — Tesseract command assembly (lib/ocr_step.py:132-194). The
    * external binary is out of scope (its output *is* the span table);
    * the parameter normalization/ordering semantics are preserved:
    *  - `tesseract_bin` overrides the binary and is removed;
    *  - `extra` becomes a bare flag appended where `extra` stood;
    *  - `model_configs` (or an existing `-l`) is re-added as `-l` at
    *    the current tail;
    *  - `output_configs` (default "alto") unions with valueless
    *    `alto|txt|pdf` keys, sorted+deduped, appended last;
    *  - cmd = `<bin> <path_in> <out_base> <params>` where out_base is
    *    path_next minus its extension.
    */
  final class TesseractCmd(rawParams: Seq[(String, Option[String])]) {
    require(rawParams != null)
    private val params = mutable.LinkedHashMap.empty[String, Option[String]]
    rawParams.foreach { case (k, v) => params.put(k, v) }
    params.remove("type")

    private val bin: String =
      params.remove("tesseract_bin").flatten.getOrElse("tesseract")
    params.remove("path_out_dir")

    params.remove("extra").flatten.filter(_.nonEmpty).foreach { x =>
      params.put(x, None)
    }
    // reference precedence (lib/ocr_step.py:148-156): BOTH keys are
    // always consumed and an explicit `-l` OVERRIDES model_configs
    // (even a valueless `-l` flag, which suppresses the model entirely);
    // the surviving value is re-inserted at the current tail
    private val models: Option[String] = {
      val fromConfigs = params.remove("model_configs").flatten
      val lEntry = params.remove("-l")
      if (lEntry.isDefined) lEntry.get else fromConfigs
    }
    models.foreach(m => params.put("-l", Some(m)))

    private val outputConfigs: Seq[String] =
      params.remove("output_configs").flatten.getOrElse("alto")
        .split("\\s+").toSeq.filter(_.nonEmpty)
    private val outputs: Seq[String] =
      params.collect { case (k, None) if Set("alto", "txt", "pdf")(k) => k }.toSeq
    outputs.foreach(params.remove)
    private val finalOutputs: String =
      (outputConfigs ++ outputs).distinct.sorted.mkString(" ")
    params.put(finalOutputs, None)

    var pathIn: String = ""

    def pathNext: String = {
      val (dir, fname) = splitPath(pathIn)
      val f = if (fname.endsWith(".xml")) fname else fname + ".xml"
      if (dir.isEmpty) f else s"$dir/$f"
    }

    def cmd: String = {
      val outBase = pathNext.stripSuffix(".xml")
      s"$bin $pathIn $outBase ${dict2line(params.toSeq, " ")}"
    }
  }

  /** One configured stage (E1 step registry): the ini `step_NN`
    * sections become an ordered list that folds into an
    * [[ExtractConfig]]. Unknown step types raise, mirroring the
    * reference's `globals()[the_type]` KeyError. */
  final case class StepConf(section: String, typ: String, params: Map[String, String])

  /** Minimal ini parser (sections + key=value, `#`/`;` comments). */
  def parseIni(text: String): Seq[(String, Seq[(String, String)])] = {
    val out = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, String]]
    var cur: mutable.LinkedHashMap[String, String] = null
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          val name = line.substring(1, line.length - 1)
          cur = out.getOrElseUpdate(name, mutable.LinkedHashMap.empty)
        } else if (cur != null && line.contains("=")) {
          val Array(k, v) = line.split("=", 2)
          cur.put(k.trim, v.trim)
        }
      }
    }
    out.toSeq.map { case (k, v) => k -> v.toSeq }
  }

  /** Ordered steps from config, sorted by their numeric suffix
    * (ocr_pipeline.py:108-110). */
  def steps(ini: Seq[(String, Seq[(String, String)])]): Seq[StepConf] =
    ini.filter(_._1.startsWith("step_"))
      .sortBy(s => s._1.split("_")(1).toInt)
      .map { case (sec, kvs) =>
        val m = kvs.toMap
        StepConf(sec, m.getOrElse("type",
          throw new IllegalArgumentException(s"section $sec has no type")), m)
      }

  /** XML entity decode for config-borne replacement keys: the
    * reference's dicts target SERIALIZED ALTO lines (where `<` appears
    * as `&lt;`, conf/ocr_config.ini:24); the engine's span text is
    * unescaped, so the equivalent key is the decoded character. */
  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Fold the configured steps into the engine's ExtractConfig — the
    * "ordered named steps" semantics of the reference with stages
    * mapped to their Spark twins. */
  def toExtractConfig(stepConfs: Seq[StepConf]): ExtractConfig = {
    stepConfs.foldLeft(ExtractConfig(replaceDict = Nil)) { (cfg, sc) =>
      sc.typ match {
        case "StepTesseract" => cfg // external black box: input table IS its output
        case "StepPostReplaceChars" =>
          cfg.copy(replaceDict = parseDict(sc.params.getOrElse("dict_chars", "{}"))
            .map { case (k, v) => xmlUnescape(k) -> xmlUnescape(v) })
        case "StepPostReplaceCharsRegex" =>
          cfg.copy(regexRule = Some(RegexRule(
            unquote(sc.params("pattern")),
            unquote(sc.params("old")),
            unquote(sc.params("new")))))
        case "StepPostprocessALTO" =>
          cfg.copy(pagePrefix = sc.params.getOrElse("page_prefix", "p"))
        case "StepEstimateOCR" => cfg // estimation always runs; oracle is engine-side
        case "StepPostMoveAlto" | "StepPostRemoveFile" => cfg // file plumbing: no-op on tables
        case other =>
          throw new IllegalArgumentException(s"unknown step type '$other'")
      }
    }
  }
}
