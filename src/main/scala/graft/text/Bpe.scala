package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding with a REAL learned merge table — the tokenizer
  * a training-data pipeline meters tokens with (q37's GPT-2-style
  * regex is only the pretokenizer; this adds the merge loop on top).
  *
  * Scale shape (the part that must survive 10^12 docs):
  *
  *  - '''learn''' reduces the corpus to a word-type frequency table
  *    with ONE distributed groupBy — the only corpus-sized work —
  *    then caps it to the `vocabCap` most frequent types and runs the
  *    classic Sennrich merge loop (arXiv:1508.07909 §3) driver-side
  *    on that bounded table. This mirrors how production BPE trainers
  *    work: the merge loop is O(types × merges), independent of corpus
  *    size, and a capped type table is a few MB (the IvfIndex
  *    collect-k-centroids pattern, never a corpus collect).
  *  - '''encodeCount''' broadcasts the merge ranks (tiny) and encodes
  *    narrowly inside `mapPartitions` — no shuffle at all; the
  *    per-word encode memoizes on a per-partition LRU-ish map because
  *    Zipfian corpora repeat words constantly.
  *
  * Determinism: ties in pair frequency break on the lexicographically
  * smallest pair; the vocab cap orders by (count DESC, word ASC); the
  * apply merges the lowest-rank pair's occurrences left-to-right
  * (GPT-2 convention). Same corpus → same merges → same counts,
  * independent of partitioning.
  */
/** A learned tokenizer artifact: the merge table plus the base
  * alphabet it was learned over, with a derived token-id vocabulary
  * (GPT-2 convention: special sentinel, then the base alphabet, then
  * one token per merge in rank order). Ids are therefore stable
  * across [[Bpe.save]]/[[Bpe.load]] round-trips — a training pipeline
  * can tokenize shards months apart against the same artifact. */
final case class BpeModel(alphabet: Vector[String],
    merges: Vector[(String, String)]) {

  /** symbol → token id. Covers every symbol [[Bpe.encode]] can emit
    * for in-alphabet text; out-of-alphabet characters (new scripts in
    * a later corpus slice) are NOT silently assigned — callers map
    * them to [[BpeModel.UnknownId]]. Surface-string collisions (two
    * merges whose concatenations produce the same string, e.g.
    * ("a","bc") and ("ab","c") → "abc") would silently collapse ids
    * under `.toMap` — [[assertDistinctVocab]] (called at learn and
    * load time) rejects such artifacts loudly instead. */
  lazy val vocab: Map[String, Int] =
    ((Bpe.Eow +: alphabet).distinct ++ merges.map { case (a, b) => a + b })
      .zipWithIndex.toMap

  /** Throws if two vocabulary entries share a surface string (the
    * artifact would have fewer usable ids than rows, invisibly). */
  def assertDistinctVocab(): BpeModel = {
    val syms = (Bpe.Eow +: alphabet).distinct ++ merges.map { case (a, b) => a + b }
    if (vocab.size != syms.size) {
      val dups = syms.groupBy(identity).collect {
        case (s, g) if g.size > 1 => s
      }.toSeq.sorted
      throw new IllegalArgumentException(
        s"BPE vocab surface-string collision: ${dups.take(5).mkString(", ")} — " +
          "two merges concatenate to the same token string; ids would " +
          "silently collapse at encode time")
    }
    this
  }

  def tokenId(sym: String): Int = vocab.getOrElse(sym, BpeModel.UnknownId)
}

object BpeModel {
  val UnknownId: Int = -1
}

object Bpe {

  /** End-of-word sentinel (Sennrich `</w>`): keeps merges from
    * crossing word boundaries when frequencies are aggregated over
    * word types. Chosen outside the corpus alphabet. */
  val Eow = "</w>"

  /** Learn up to `nMerges` merges. Stops early when the best pair
    * occurs fewer than `minCount` times (merging hapax pairs is
    * noise). Words are whitespace token types of `textCol`. */
  def learn(corpus: DataFrame, textCol: String, nMerges: Int,
      vocabCap: Int = 10000, minCount: Long = 2L): Seq[(String, String)] =
    learnModel(corpus, textCol, nMerges, vocabCap, minCount).merges

  /** Like [[learn]] but returns the full persistable artifact: the
    * merge table plus the base alphabet of the capped type table
    * (sorted — deterministic ids). */
  def learnModel(corpus: DataFrame, textCol: String, nMerges: Int,
      vocabCap: Int = 10000, minCount: Long = 2L): BpeModel = {
    // the one corpus-scale job: word-type counts, capped. The cap is
    // what bounds the driver collect — NEVER lift it to "all types"
    // on an unbounded corpus.
    val types = corpus
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val alphabet = types.iterator.flatMap(_._1.iterator)
      .map(_.toString).toVector.distinct.sorted
    BpeModel(alphabet, learnFromTypes(types, nMerges, minCount).toVector)
      .assertDistinctVocab()
  }

  /** Persist a learned model as a new version of a
    * [[graft.io.SnapshotStore]] table (rows: kind ∈ {alpha, merge},
    * rank, a, b) — the same atomic-manifest commit protocol the
    * extraction sink uses, so tokenizer artifacts get snapshot
    * isolation, time travel (retokenize an old shard against the
    * EXACT model that produced it via `load(root, Some(v))`), and
    * [[graft.io.SnapshotStore.expire]] GC for free. Returns the
    * committed version. */
  def save(spark: SparkSession, model: BpeModel, root: String): Long = {
    import spark.implicits._
    val rows =
      model.alphabet.zipWithIndex.map { case (s, i) => ("alpha", i, s, null: String) } ++
      model.merges.zipWithIndex.map { case ((a, b), i) => ("merge", i, a, b) }
    val store = new graft.io.SnapshotStore(spark, root)
    val path = store.newDataPath(0)
    // one artifact = one partition = one file: tiny by construction
    // (vocabCap-bounded), so the single-file write is the right shape
    rows.toDF("kind", "rank", "a", "b").coalesce(1)
      .write.mode("overwrite").parquet(path)
    store.commit(0, path, rows.size.toLong, 0L, 0L)
  }

  /** Load a model version (default: current) saved by [[save]].
    * The collect is bounded by the learner's vocabCap. */
  def load(spark: SparkSession, root: String,
      version: Option[Long] = None): BpeModel = {
    val rows = new graft.io.SnapshotStore(spark, root).read(version)
      .select(col("kind"), col("rank"), col("a"), col("b"))
      .collect()
    val alphabet = rows.filter(_.getString(0) == "alpha")
      .sortBy(_.getInt(1)).map(_.getString(2)).toVector
    val merges = rows.filter(_.getString(0) == "merge")
      .sortBy(_.getInt(1)).map(r => (r.getString(2), r.getString(3))).toVector
    BpeModel(alphabet, merges).assertDistinctVocab()
  }

  /** The merge loop itself, exposed for tests: `types` are (word,
    * count) pairs. Pure, deterministic. */
  def learnFromTypes(types: Seq[(String, Long)], nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    // vocab: symbol-sequence -> count (chars + end-of-word sentinel)
    var vocab: Map[Vector[String], Long] = types
      .map { case (w, c) => (w.map(_.toString).toVector :+ Eow, c) }
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < minCount) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          vocab = vocab.map { case (syms, c) => (mergePair(syms, a, b), c) }
            .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
          i += 1
        }
      }
    }
    merges.result()
  }

  /** Replace every non-overlapping (a,b) adjacency left-to-right. */
  private def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word under the merge ranks: repeatedly merge the
    * LOWEST-rank adjacent pair present (GPT-2 apply order), all its
    * occurrences left-to-right per round. */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var go = true
    while (go && syms.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) go = false
      else syms = mergePair(syms, best._1, best._2)
    }
    // the sentinel is part of the final symbol (word-final marker),
    // matching the learner's vocab representation
    syms
  }

  /** Per-doc BPE token count under `merges` — narrow, no shuffle:
    * ranks ride a broadcast; encodes memoize per word type within the
    * partition (Zipf makes the hit rate high). */
  def encodeCount(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("string").as("doc_id"),
        col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        val memo = new java.util.HashMap[String, Integer](1 << 12)
        it.map { case (id, text) =>
          val words = TextRules.splitWs(if (text == null) "" else text)
          var n = 0
          words.foreach { w =>
            val cached = memo.get(w)
            if (cached != null) n += cached.intValue
            else {
              val c = encode(w, ranks).length
              if (memo.size < (1 << 16)) memo.put(w, Integer.valueOf(c))
              n += c
            }
          }
          (id, n, words.length)
        }
      }
      .toDF("doc_id", "n_bpe", "n_words")
  }

  /** Encoded token strings per doc (contract/debug surface; the
    * count path is [[encodeCount]]). */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("string").as("doc_id"),
        col(textCol).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val toks = TextRules.splitWs(if (text == null) "" else text)
          .flatMap(w => encode(w, ranksB.value))
        (id, toks)
      }
      .toDF("doc_id", "toks")
  }
}
