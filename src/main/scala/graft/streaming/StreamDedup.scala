package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming exact deduplication with state that survives micro-batch
  * boundaries: the first document carrying a given content fingerprint
  * is emitted, every later copy (same batch or any later batch) is
  * dropped. `mapGroupsWithState` keyed by the fingerprint — the
  * streaming twin of the batch exact-dedup (q20), and the shape a
  * continuously-ingesting training-data pipeline needs (state size =
  * one (fp, keeper) pair per distinct document, NOT per document).
  *
  * Note Spark's built-in `dropDuplicates` on a stream needs a
  * watermark to bound state and drops late copies only inside the
  * watermark; this variant keeps exact keep-first semantics for
  * unbounded-retention corpora.
  */
object StreamDedup {

  final case class FpDoc(fp: String, doc_id: String)
  final case class Kept(fp: String, keeper: String, n_copies: Long)

  def update(fp: String, docs: Iterator[FpDoc],
      state: GroupState[Kept]): Iterator[Kept] = {
    val sorted = docs.toSeq.sortBy(_.doc_id)
    state.getOption match {
      case Some(k) =>
        state.update(k.copy(n_copies = k.n_copies + sorted.length))
        Iterator.empty // all copies of an already-kept doc are dropped
      case None =>
        val kept = Kept(fp, sorted.head.doc_id, sorted.length.toLong)
        state.update(kept)
        Iterator.single(kept)
    }
  }

  /** Emit each fingerprint's keeper exactly once across the stream. */
  def dedup(docs: Dataset[FpDoc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
