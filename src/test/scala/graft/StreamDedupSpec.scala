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

  test("file-stream dedup surface: keep-first across AvailableNow ticks") {
    import spark.implicits._
    import graft.model.{Doc, Span}
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdd").toString
    def doc(id: String, text: String) =
      Doc(id, text.split(" ").zipWithIndex.map { case (t, i) =>
        Span(Span.KindText, t, "line://b/l0", i)
      }.toVector)

    // tick 1: d2 duplicates d1's content
    Seq(doc("d1", "gleicher inhalt hier"), doc("d2", "gleicher inhalt hier"),
      doc("d3", "anderer text"))
      .toDS().write.parquet(s"$tmp/in")
    graft.streaming.StreamExtract
      .dedupAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ck")
      .awaitTermination()
    val t1 = spark.read.parquet(s"$tmp/out")
      .select("keeper").as[String].collect().sorted.toSeq
    assert(t1 == Seq("d1", "d3"))

    // tick 2: a late copy of d1's content is dropped, a new doc kept
    Seq(doc("d9", "gleicher inhalt hier"), doc("d4", "noch ein neuer"))
      .toDS().write.mode("append").parquet(s"$tmp/in")
    graft.streaming.StreamExtract
      .dedupAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ck")
      .awaitTermination()
    val t2 = spark.read.parquet(s"$tmp/out")
      .select("keeper").as[String].collect().sorted.toSeq
    assert(t2 == Seq("d1", "d3", "d4"))
  }

  test("TTL variant: expired state re-admits a fingerprint; live state still dedups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val input = MemoryStream[StreamDedup.FpDocT]
    // 60 s TTL, zero allowed out-of-orderness → expiry is driven purely
    // by event time, deterministic under replay
    val q = StreamDedup.dedupTtl(input.toDS(), ttlMs = 60000)
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: fpA kept (watermark after batch: 10 s, timeout 70 s)
      input.addData(StreamDedup.FpDocT("fpA", "doc1", ts(10)))
      q.processAllAvailable()
      // batch 2: a copy INSIDE the ttl window is dropped; watermark → 50 s
      input.addData(StreamDedup.FpDocT("fpA", "doc2", ts(50)))
      q.processAllAvailable()
      // batch 3: unrelated key pushes the watermark to 200 s (past fpA's
      // 110 s timeout — fpA's state is removed during batch 4)
      input.addData(StreamDedup.FpDocT("fpZ", "doc3", ts(200)))
      q.processAllAvailable()
      // batch 4: timeout fires for fpA (no new data needed for the group)
      input.addData(StreamDedup.FpDocT("fpY", "doc4", ts(210)))
      q.processAllAvailable()
      // batch 5: fpA returns AFTER expiry → re-admitted as a new keeper
      input.addData(StreamDedup.FpDocT("fpA", "doc9", ts(220)))
      q.processAllAvailable()
      val rows = spark.table("dedup_ttl_out")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(rows == Seq(("fpA", "doc1"), ("fpA", "doc9"),
        ("fpY", "doc4"), ("fpZ", "doc3")))
    } finally q.stop()
  }
}
