package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.io.Checkpoint
import graft.run.ExtractMain

/** Checkpoint/resume protocol (T1/J1): kill-resume idempotence — a
  * re-run after losing one partition's commit reprocesses exactly that
  * partition and converges to the same corpus output. */
class CheckpointSpec extends SparkSpecBase {

  test("resume reprocesses only uncommitted partitions, output identical") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val spansPath = s"$tmp/spans"
    val outRoot = s"$tmp/out"

    graft.gen.CorpusGen.docs(spark, 200, "interleaved")
      .write.mode(SaveMode.Overwrite).parquet(spansPath)

    ExtractMain.run(spark, spansPath, outRoot, nParts = 4)
    val full = spark.read.parquet(s"$outRoot/data/p_*")
      .select($"doc_id", $"hit_ratio", $"n_words").as[(String, Double, Int)]
      .collect().sortBy(_._1).toSeq
    assert(full.size == 200)

    // simulate a crash that lost partition 2's commit + data
    val ckpt = new Checkpoint(spark, outRoot)
    assert(ckpt.done() == Set(0, 1, 2, 3))
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(s"$outRoot/state/p_2"))
    rmrf(new java.io.File(s"$outRoot/data/p_2"))
    assert(ckpt.done() == Set(0, 1, 3))
    assert(ckpt.pending(0 until 4) == Seq(2))

    ExtractMain.run(spark, spansPath, outRoot, nParts = 4)
    val resumed = spark.read.parquet(s"$outRoot/data/p_*")
      .select($"doc_id", $"hit_ratio", $"n_words").as[(String, Double, Int)]
      .collect().sortBy(_._1).toSeq
    assert(resumed == full)
    assert(ckpt.done() == Set(0, 1, 2, 3))

    // lineage carries per-partition metrics
    val lin = ckpt.lineage().collect()
    assert(lin.length == 4)
    assert(lin.map(_.getAs[Long]("n_docs")).sum == 200)
  }
}
