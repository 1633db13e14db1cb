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

  /** Emit each fingerprint's keeper exactly once across the stream.
    *
    * UNBOUNDED-STATE contract: one (fp, keeper) row is retained
    * forever — correct keep-first semantics for the AvailableNow
    * batch-tick deployments this engine schedules (state is bounded by
    * the corpus's distinct-document count and lives in the state
    * store, not the heap). A continuously-running deployment that may
    * not retain every fingerprint to end-of-time should use
    * [[dedupTtl]] instead. */
  def dedup(docs: Dataset[FpDoc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Timestamped input for the TTL variant. */
  final case class FpDocT(fp: String, doc_id: String, ts: java.sql.Timestamp)

  private def updateTtl(ttlMs: Long)(fp: String, docs: Iterator[FpDocT],
      state: GroupState[Kept]): Iterator[Kept] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val sorted = docs.toSeq.sortBy(_.doc_id)
      val out = state.getOption match {
        case Some(k) =>
          state.update(k.copy(n_copies = k.n_copies + sorted.length))
          Iterator.empty
        case None =>
          val kept = Kept(fp, sorted.head.doc_id, sorted.length.toLong)
          state.update(kept)
          Iterator.single(kept)
      }
      // expire ttl past the newest copy seen; never behind the current
      // watermark (setting an already-passed timeout is an error)
      val maxTs = sorted.map(_.ts.getTime).max
      state.setTimeoutTimestamp(
        math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
      out
    }
  }

  /** Keep-first dedup with bounded state for continuous deployments:
    * a fingerprint's state expires once the EVENT-TIME watermark
    * passes `ttlMs` beyond its newest copy, so state size tracks the
    * retention window instead of corpus lifetime. A copy arriving
    * after expiry is re-admitted as a fresh keeper — the standard
    * retention/correctness trade every windowed dedup makes (event-
    * time expiry, unlike a processing-time timer, is deterministic
    * under replay/backfill). `watermarkDelay` is the usual
    * out-of-orderness bound. */
  def dedupTtl(docs: Dataset[FpDocT], ttlMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermarkDelay)
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateTtl(ttlMs))
  }
}
