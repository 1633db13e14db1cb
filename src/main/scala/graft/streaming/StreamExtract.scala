package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.stages.{ExtractConfig, Extraction}

/** Incremental ingestion as Structured Streaming — the engine twin of
  * the reference's cron + marker-file incrementality (T1/T2,
  * manage-container-ocr.sh:33-101): new span files appearing under the
  * input path are picked up, run through the identical stage chain,
  * and committed exactly-once via the streaming checkpoint.
  *
  * The whole extraction chain is stateless per document, so it runs
  * unchanged under the micro-batch engine; `Trigger.AvailableNow`
  * reproduces the reference's "process everything currently open,
  * then stop" cron tick.
  */
object StreamExtract {

  /** One definition of the span-table input schema for every streaming
    * surface (a drifted copy would give the surfaces silently different
    * inputs). */
  private val SpanTableSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")

  private def spanStream(spark: SparkSession, inDir: String) =
    spark.readStream
      .schema(SpanTableSchema)
      .option("maxFilesPerTrigger", "64")
      .parquet(inDir)

  /** Start an AvailableNow extraction pass: spans parquet dir → processed
    * parquet dir, exactly-once via `checkpointDir`. */
  def availableNow(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, cfg: ExtractConfig = ExtractConfig()): StreamingQuery = {
    val stream = spanStream(spark, inDir)
    val processed = Extraction.pipeline(stream.toDF(), cfg).toDF()
    processed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Start an AvailableNow streaming-dedup pass: spans parquet dir →
    * keepers parquet dir. Each document is fingerprinted (md5 of the
    * joined text-span sequence) and only the FIRST carrier of a
    * fingerprint — across this and every earlier tick, via the state
    * store — is emitted ([[StreamDedup]]). The streaming twin of the
    * batch exact-dedup (q20) as a CLI-reachable surface. */
  def dedupAvailableNow(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val stream = spanStream(spark, inDir)
    // fingerprint over the OFFSET-SORTED sequence: span order is
    // defined by `offset`, not by parquet storage order (Model.scala
    // contract) — hashing the raw array would let two copies of the
    // same document escape dedup when their arrays are stored in
    // different orders
    val fps = stream
      .select(col("doc_id"),
        md5(concat_ws(" ",
          filter(graft.sql.SpanOps.sortByOffset(col("spans")),
            s => s.getField("kind") === "text")
          .getField("text"))).as("fp"))
      .select(col("fp"), col("doc_id"))
      .as[StreamDedup.FpDoc]
    StreamDedup.dedup(fps).toDF()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Windowed per-source quality monitoring over a processed-doc
    * stream: 10-minute tumbling mean hit ratio with a watermark —
    * the streaming analog of the corpus report (A4). */
  def qualityByWindow(processed: DataFrame, tsCol: String): DataFrame = {
    // mirror the batch report (A4): the -1.0 MissingRatio sentinel is
    // EXCLUDED from the mean and counted separately as invalid — a raw
    // avg would drag the monitoring signal down with every
    // unestimated document
    val valid = col("hit_ratio") =!= graft.model.Estimation.MissingRatio
    processed
      .withWatermark(tsCol, "30 minutes")
      .groupBy(window(col(tsCol), "10 minutes"))
      .agg(round(avg(when(valid, col("hit_ratio"))), 3).as("mean_ratio"),
        count(when(valid, 1)).as("n_docs"),
        count(when(!valid, 1)).as("n_invalid"))
  }
}
