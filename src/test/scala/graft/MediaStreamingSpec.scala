package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.multimodal.Media
import graft.streaming.StreamExtract

/** Multimodal plumbing + structured-streaming incrementality. */
class MediaStreamingSpec extends SparkSpecBase {

  test("media decode: pooled stub decoder, deterministic metadata") {
    import spark.implicits._
    val refs = (0 until 100).map(i => s"media://doc$i/0").toDF("media_ref")
    val media = Media.synthMedia(spark, refs)
    val meta = Media.decodeMeta(media).collect()
    assert(meta.length == 100)
    assert(meta.forall(m => m.width >= 64 && m.height >= 64))
    assert(meta.forall(_.feature.length == 16))
    // deterministic: second run identical
    val meta2 = Media.decodeMeta(media).collect()
    assert(meta.map(m => (m.media_ref, m.width, m.height, m.n_frames)).sorted.toSeq ==
      meta2.map(m => (m.media_ref, m.width, m.height, m.n_frames)).sorted.toSeq)
    // video payloads produce frame samples
    val frames = Media.sampleFrames(Media.decodeMeta(media), everyN = 10)
    assert(frames.count() > 0)
    // resize plan: aspect preserved (within even-alignment), longest
    // side <= 512, never upscaled
    val plan = Media.resizePlan(Media.decodeMeta(media), maxSide = 512).collect()
    assert(plan.length == 100)
    plan.foreach { r =>
      val (w, h, dw, dh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(dw <= math.max(512, 2) && dh <= 512 || (w <= 512 && h <= 512))
      assert(dw <= w && dh <= h, s"upscaled: $r")
      assert(dw % 2 == 0 && dh % 2 == 0)
      if (w > 512 || h > 512) {
        val src = w.toDouble / h
        assert(math.abs(dw.toDouble / dh - src) / src < 0.1, s"aspect: $r")
      }
    }
  }

  test("streaming AvailableNow pass == batch pipeline result, incremental pickup") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"

    val batch1 = graft.gen.CorpusGen.docs(spark, 50, "interleaved").toDF()
    batch1.write.mode(SaveMode.Overwrite).parquet(in)

    StreamExtract.availableNow(spark, in, out, ck).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 50)

    // new files arrive → only the delta is processed on the next tick
    graft.gen.CorpusGen.docs(spark, 80, "interleaved").toDF()
      .filter(col("doc_id") >= "doc_000000000050")
      .write.mode(SaveMode.Append).parquet(in)
    StreamExtract.availableNow(spark, in, out, ck).awaitTermination()
    val res = spark.read.parquet(out)
    assert(res.count() == 80)
    assert(res.select("doc_id").distinct().count() == 80)

    // streaming output matches the batch pipeline on the same input
    val batchOut = graft.stages.Extraction
      .pipeline(spark.read.parquet(in))
      .select($"doc_id", $"hit_ratio", $"n_words", size($"spans").as("ns"))
      .as[(String, Double, Int, Int)].collect().sortBy(_._1).toSeq
    val streamOut = res
      .select($"doc_id", $"hit_ratio", $"n_words", size($"spans").as("ns"))
      .as[(String, Double, Int, Int)].collect().sortBy(_._1).toSeq
    assert(streamOut == batchOut)
  }
}
