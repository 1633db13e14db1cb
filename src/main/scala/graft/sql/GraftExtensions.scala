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
  *    — the full per-document chain with the production defaults;
  *  - `graft_minhash(text)` → array<bigint> (one-pass xxhash minhash);
  *  - `graft_md5_minhash(text)` → array<string> (DuckDB-parity md5);
  *  - `graft_simhash(text)` → bigint (16-bit md5 bit-vote fingerprint);
  *  - `graft_cosine(a, b)` → double (fused cosine similarity).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(ext: SparkSessionExtensions, name: String,
      clazz: Class[_], build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    val defaultCfg = ProcessConfig(
      replaceDict = TextRules.DefaultReplaceDict,
      regex = None, minLineLen = 2, denseMinLen = 2)
    register(ext, "graft_process_spans", classOf[ProcessSpans],
      children => ProcessSpans(children.head, defaultCfg))
    register(ext, "graft_minhash", classOf[MinHashSig],
      children => MinHashSig(children.head, 8))
    register(ext, "graft_md5_minhash", classOf[Md5MinHash],
      children => Md5MinHash(children.head, 8))
    register(ext, "graft_simhash", classOf[SimHash16],
      children => SimHash16(children.head))
    register(ext, "graft_cosine", classOf[CosineSim],
      children => CosineSim(children(0), children(1)))
  }
}
