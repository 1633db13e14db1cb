package graft.run

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Checkpoint
import graft.stages.{ExtractConfig, Extraction}

/** Checkpointed extraction job over a span table — the engine twin of
  * `python ocr_pipeline.py <data_path>` (ocr_pipeline.py:445-538).
  *
  * Usage: ExtractMain <spansParquet> <outRoot> [nParts]
  *
  * The corpus is bucketed into `nParts` logical partitions by doc_id
  * hash (the analog of the reference's directory partitions). Each
  * partition is processed and committed independently with lineage
  * metrics; a killed run resumes from the last committed partition
  * (Checkpoint). Within a partition the plan is fully narrow — scan →
  * codegen'd span stages → typed estimate map → write — with one tiny
  * aggregate at the end for the corpus report (S11).
  */
object ExtractMain {

  def main(args: Array[String]): Unit = {
    val inPath = args(0)
    val outRoot = args(1)
    val nParts = if (args.length > 2) args(2).toInt else 8
    val backup = sys.env.get("SPARK_GRAFT_BACKUP").contains("1")
    // E1: an ini pipeline definition (the reference's own config file
    // format) drives the stage chain when provided
    val cfg = sys.env.get("SPARK_GRAFT_CONFIG").map { p =>
      PipelineConfig.toExtractConfig(PipelineConfig.steps(
        PipelineConfig.parseIni(java.nio.file.Files.readString(
          java.nio.file.Paths.get(p)))))
    }.getOrElse(ExtractConfig())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, inPath, outRoot, nParts, backup, cfg)
    spark.stop()
  }

  /** Legacy-layout migration: an output root written by the
    * marker-only release has committed `state/p_N` markers and data
    * parquet directly under `data/p_N` (no attempt dirs, no
    * manifests). Resume keyed solely on the snapshot store would
    * silently reprocess everything and strand the old files as
    * orphans the manifest GC can't see. On startup, if markers exist
    * but no manifest does, each completed legacy partition's loose
    * files are MOVED into a synthetic `a_legacy` attempt dir and that
    * dir is committed (lineage carried from the marker). Referencing
    * `data/p_N` itself would be wrong: it is the PARENT of all future
    * attempt dirs, so a later recommit would nest new files inside a
    * path older manifests still list recursively — double-reads under
    * time travel. Markers without completed data get an explicit
    * full-reprocess warning instead of a silent one. */
  def backfillLegacy(spark: SparkSession, outRoot: String,
      ckpt: Checkpoint, snap: graft.io.SnapshotStore): Unit = {
    if (snap.currentVersion().isDefined) return
    val legacy = ckpt.lineage().collect()
    if (legacy.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(outRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    legacy.foreach { r =>
      val p = r.getAs[Int]("part")
      val dataDir = new org.apache.hadoop.fs.Path(s"$outRoot/data/p_$p")
      if (fs.exists(new org.apache.hadoop.fs.Path(dataDir, "_SUCCESS"))) {
        val legacyAttempt = new org.apache.hadoop.fs.Path(dataDir, "a_legacy")
        fs.mkdirs(legacyAttempt)
        fs.listStatus(dataDir).filter(_.isFile).foreach { f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(
            legacyAttempt, f.getPath.getName))
        }
        val v = snap.commit(p, legacyAttempt.toString, r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("n_failures"))
        println(s"[extract] backfilled legacy part=$p into snapshot v$v")
      } else {
        println(s"[extract] WARNING: legacy marker for part=$p has no " +
          s"completed data at $dataDir — the partition WILL be reprocessed")
      }
    }
  }

  def run(spark: SparkSession, inPath: String, outRoot: String, nParts: Int,
      backup: Boolean = false, cfg: ExtractConfig = ExtractConfig()): Unit = {
    import spark.implicits._
    val ckpt = new Checkpoint(spark, outRoot)
    // snapshot manifests are the commit source of truth (MERGE-style
    // overwrite-partition + snapshot isolation; see SnapshotStore);
    // the per-partition state markers remain as the backup/pre-image
    // location and a best-effort mirror for Checkpoint API users
    val snap = new graft.io.SnapshotStore(spark, outRoot)
    val docs = spark.read.parquet(inPath)
      .withColumn("part", pmod(xxhash64(col("doc_id")), lit(nParts)).cast("int"))

    backfillLegacy(spark, outRoot, ckpt, snap)
    val done = snap.done()
    val todo = (0 until nParts).filterNot(done.contains)
    println(s"[extract] partitions total=$nParts pending=${todo.size}")

    // S7: backup only when the config can actually modify content —
    // the reference's `if self._replacements and self.must_backup()`
    // gate (lib/ocr_step.py:230-232)
    val doBackup = backup && (cfg.replaceDict.nonEmpty || cfg.regexRule.nonEmpty)

    todo.foreach { p =>
      val slice = docs.filter($"part" === p).drop("part")
      if (doBackup)
        slice.write.mode(SaveMode.Overwrite).parquet(ckpt.backupPath(p))
      // single pass: observe() collects lineage metrics during the write;
      // every attempt writes a FRESH dir — commits replace metadata, not files
      val attempt = snap.newDataPath(p)
      val (out, obs) = Extraction.observed(Extraction.pipeline(slice, cfg))
      out.write.mode(SaveMode.Overwrite).parquet(attempt)
      val m = obs.get
      val (nDocs, nSpans, nUnest) = (m("docs_parsed").asInstanceOf[Long],
        m("spans_emitted").asInstanceOf[Long], m("docs_unestimated").asInstanceOf[Long])
      ckpt.commit(p, nDocs, nSpans, nUnest)
      val v = snap.commit(p, attempt, nDocs, nSpans, nUnest)
      println(s"[extract] committed part=$p snapshot=v$v docs=$nDocs " +
        s"spans=$nSpans unestimated=$nUnest")
    }

    // corpus report over the CURRENT SNAPSHOT (consistent view;
    // ocr_pipeline.py:233-269): summary (mean + bins + totals) and
    // ratio-sorted detail (S11 .wtr)
    val all = snap.read().as[graft.stages.ProcessedDoc]
    val rep = Extraction.writeReport(all, s"$outRoot/report")
    println(s"[extract] report: mean=${rep.mean} bins=[${rep.b1},${rep.b2},${rep.b3},${rep.b4},${rep.b5}] " +
      s"total=${rep.n_total} invalid=${rep.n_invalid}")
    // exact-layout `.wtr` compatibility file for downstream parsers
    // (single file; SPARK_GRAFT_WTR=0 opts out for huge corpora where
    // only the distributed report makes sense)
    if (!sys.env.get("SPARK_GRAFT_WTR").contains("0")) {
      // over the driver-streamed cap the run must NOT die at its last
      // step: skip the compat file (the distributed report above is
      // the corpus-scale surface) and keep going with maintenance
      if (rep.n_total > Extraction.WtrMaxRows)
        println(s"[extract] wtr skipped: ${rep.n_total} rows exceed the " +
          s"driver-streamed cap ${Extraction.WtrMaxRows}; use the " +
          "distributed report (SPARK_GRAFT_WTR=0 silences this)")
      else {
        val stamp = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd_HH-mm").withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.now())
        val wtrPath = s"$outRoot/report/corpus_$stamp.wtr"
        Extraction.writeWtr(all, wtrPath, precomputed = Some(rep))
        println(s"[extract] wtr: $wtrPath")
      }
    }
    // optional snapshot maintenance: SPARK_GRAFT_EXPIRE=<keepLast>
    // drops manifest history and GCs orphaned attempt dirs
    sys.env.get("SPARK_GRAFT_EXPIRE").map(_.toInt).foreach { keep =>
      val (m, d) = snap.expire(keep)
      println(s"[extract] expired $m snapshots, removed $d orphan dirs (keepLast=$keep)")
    }
    // A1/A2 corpus replacement statistics, reference `ſ:392` format
    // (ocr_pipeline.py:402-411) — O(#distinct keys) driver-side
    val stats = Extraction.corpusReplStats(all).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}")
    println(s"[extract] replacement stats: ${stats.mkString(", ")}")
    ckpt.lineage().show(truncate = false)
  }
}
