package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.FpDoc

/** Keep-first streaming dedup: duplicates are dropped across
  * micro-batch boundaries, state is per distinct fingerprint. */
class StreamDedupSpec extends SparkSpecBase {

  test("duplicates across micro-batches emit exactly one keeper") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpDoc]
    val q = StreamDedup.dedup(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two copies of fpA in ONE batch + one fpB
      input.addData(FpDoc("fpA", "doc3"), FpDoc("fpA", "doc1"), FpDoc("fpB", "doc2"))
      q.processAllAvailable()
      // batch 2: late copies of both + a new fpC
      input.addData(FpDoc("fpA", "doc9"), FpDoc("fpB", "doc8"), FpDoc("fpC", "doc7"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      // keeper = lexicographically first doc of the FIRST batch the fp
      // appeared in; later copies emit nothing
      assert(rows == Seq(("fpA", "doc1"), ("fpB", "doc2"), ("fpC", "doc7")))
    } finally q.stop()
  }
}
