package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via `mapGroupsWithState` — the stateful
  * counterpart of the batch sessionization query (q14): per-user
  * session counting with a gap timeout, state carried across
  * micro-batches.
  *
  * CONTRACT (same deployment shape as [[StreamDedup.dedup]]):
  * AvailableNow ticks over an in-order-per-user source. Events are
  * sorted within each batch, but a LATE event arriving in a later
  * batch than a newer one cannot split a session retroactively (the
  * batch q14 would — this is the usual streaming/batch sessionization
  * trade; bound it with a watermarked source). State is one row per
  * user with no TTL — bounded by the user population, not the event
  * volume; a continuous deployment wanting expiry should mirror
  * [[StreamDedup.dedupTtl]]'s EventTimeTimeout pattern.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(lastTs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val GapMs: Long = 30 * 60 * 1000L

  def updateState(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): UserSessions = {
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val t = e.ts.getTime
      val newSession = st.lastTs == Long.MinValue || t - st.lastTs > GapMs
      st = SessionState(math.max(st.lastTs, t),
        st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
    }
    state.update(st)
    UserSessions(userId, st.nSessions, st.nEvents)
  }

  /** Streaming per-user session counts (Update mode). */
  def sessions(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }
}
