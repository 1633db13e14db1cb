package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.text.TextRules

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so the extraction chain is reachable
  * from plain `spark.sql(...)` too.
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.sql.GraftExtensions")
  * }}}
  *
  * SQL surface:
  *  - `graft_process_spans(spans)` → struct(spans, hit_ratio, n_words,
  *    n_errs, n_lines_in, n_wraps, n_shorts, n_lines_out, repl_stats)
  *    — the full per-document chain with the production defaults.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    val defaultCfg = ProcessConfig(
      replaceDict = TextRules.DefaultReplaceDict,
      regex = None, minLineLen = 2, denseMinLen = 2)
    ext.injectFunction((
      FunctionIdentifier("graft_process_spans"),
      new ExpressionInfo(classOf[ProcessSpans].getName, "graft_process_spans"),
      (children: Seq[Expression]) => ProcessSpans(children.head, defaultCfg)))
  }
}
