package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, UserSessions}

/** mapGroupsWithState sessionization: state survives across
  * micro-batches and gap semantics match the batch query (q14). */
class SessionizeSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("qualityByWindow aggregates hit ratios in event-time windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDS().toDF("ts", "hit_ratio")
    val q = graft.streaming.StreamExtract.qualityByWindow(df, "ts")
      .writeStream.format("memory").queryName("qw")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((ts(1), 80.0), (ts(5), 90.0), (ts(12), 60.0))
      q.processAllAvailable()
      val rows = spark.table("qw")
        .selectExpr("window.start", "mean_ratio", "n_docs")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getDouble(1), r.getLong(2)))
        .sortBy(_._1)
      assert(rows.map(r => (r._1, r._2, r._3)).toSeq ==
        Seq((0L, 85.0, 2L), (10L, 60.0, 1L)))
    } finally q.stop()
  }

  test("session state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // batch 1: user 1 has two events 5 min apart (one session)
      input.addData(Event(1, ts(0)), Event(1, ts(5)), Event(2, ts(0)))
      q.processAllAvailable()
      // batch 2: user 1 returns 90 min later (second session), user 2
      // stays within the gap (still one session)
      input.addData(Event(1, ts(95)), Event(2, ts(20)))
      q.processAllAvailable()
      val out = spark.table("sess").as[UserSessions].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(_.n_events)
        }
      assert(out(1L).n_sessions == 2 && out(1L).n_events == 3)
      assert(out(2L).n_sessions == 1 && out(2L).n_events == 2)
    } finally q.stop()
  }
}
