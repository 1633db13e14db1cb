package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via `mapGroupsWithState` — the stateful
  * counterpart of the batch sessionization query (q14): per-user
  * session counting with a gap timeout, state carried across
  * micro-batches.
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
