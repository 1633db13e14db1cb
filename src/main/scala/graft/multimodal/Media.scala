package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.CorpusGen.mix64

/** Multimodal column support: media payloads ride through the engine
  * as opaque `binary` columns with typed metadata, exactly as the span
  * table treats them as opaque `media_ref` placeholders (north_rule).
  *
  * The decode step itself (image/audio codecs) is STUBBED — the codec
  * libraries are not in this container — behind [[MediaDecoder]]; the
  * Spark-side plumbing (schema, per-partition decoder pooling, batch
  * shape, partitioning) is real and tested. Swap [[StubDecoder]] for a
  * JNI/codec-backed implementation in production.
  */
object Media {

  /** Typed metadata extracted from one media payload. */
  final case class MediaMeta(
      media_ref: String,
      mime: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Decoder interface — one instance per partition (pooled like the
    * XML parsers; never per row). */
  trait MediaDecoder extends Serializable {
    def decode(ref: String, bytes: Array[Byte], mime: String): MediaMeta
  }

  /** STUB: deterministic fake decoder. Derives pseudo metadata and a
    * 16-dim pseudo feature from a seeded hash of the payload — stands
    * in for `???` so the pipeline is runnable end-to-end. The real
    * implementation would call an image/audio codec here. */
  final class StubDecoder extends MediaDecoder {
    override def decode(ref: String, bytes: Array[Byte], mime: String): MediaMeta = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) { h = mix64(h ^ bytes(i)); i += 1 }
      val w = 64 + (math.abs(h) % 1984).toInt
      val hh = 64 + (math.abs(mix64(h + 1)) % 1024).toInt
      val frames = if (mime.startsWith("video")) 1 + (math.abs(mix64(h + 2)) % 300).toInt else 1
      val feat = Array.tabulate(16)(j =>
        (mix64(h + 3 + j).toDouble / Long.MaxValue).toFloat)
      MediaMeta(ref, mime, w, hh, frames, feat)
    }
  }

  private object DecoderPool {
    @transient private lazy val tl = new ThreadLocal[MediaDecoder] {
      override def initialValue(): MediaDecoder = new StubDecoder
    }
    def get(): MediaDecoder = tl.get()
  }

  /** Decode/feature-extract a media table
    * `(media_ref string, content binary, mime string)` into typed
    * metadata rows. Narrow `mapPartitions`; decoder pooled per task. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_ref"), col("content"), col("mime"))
      .as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        val dec = DecoderPool.get()
        it.map { case (ref, bytes, mime) =>
          dec.decode(ref, if (bytes == null) Array.emptyByteArray else bytes, mime)
        }
      }
  }

  /** Frame sampling for video payloads: emit every `everyN`-th frame
    * index as (media_ref, frame_no) — the batch shape a downstream
    * vision model consumes. Pure Catalyst (sequence + explode). */
  def sampleFrames(meta: Dataset[MediaMeta], everyN: Int): DataFrame = {
    meta.toDF()
      .filter(col("n_frames") > 1)
      .select(col("media_ref"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_no"))
  }

  /** Resize planning: aspect-preserving target dimensions for a batch
    * of decoded media, longest side clamped to `maxSide` (never
    * upscaled), even-pixel aligned (codec-friendly). Pure Catalyst —
    * the byte-level resample is codec work behind [[MediaDecoder]];
    * this computes the exact (dst_w, dst_h) plan a vision preprocessor
    * consumes. */
  def resizePlan(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    def even(c: org.apache.spark.sql.Column) =
      greatest(lit(2), (floor(c * scale / 2) * 2).cast("int"))
    meta.toDF().select(col("media_ref"), col("width"), col("height"),
      even(col("width")).as("dst_w"), even(col("height")).as("dst_h"))
  }

  /** Deterministic synthetic media table derived from span-table media
    * refs (for tests/bench: content bytes are a seeded function of the
    * ref). */
  def synthMedia(spark: SparkSession, refs: DataFrame): DataFrame = {
    refs.select(col("media_ref"),
      sha2(col("media_ref"), 256).cast("binary").as("content"),
      element_at(array(lit("image/png"), lit("video/mp4"), lit("audio/wav")),
        (pmod(xxhash64(col("media_ref")), lit(3)) + 1).cast("int")).as("mime"))
  }
}
