package graft.run

import org.apache.spark.sql.SparkSession

/** Incremental extraction pass as a CLI surface (T2): one
  * `Trigger.AvailableNow` tick over whatever span files currently sit
  * under the input path, exactly-once via the streaming checkpoint —
  * re-running after new files appear processes ONLY the new files
  * (the reference's cron + marker-file incrementality).
  *
  * Usage: StreamMain <spansParquetDir> <outDir> <checkpointDir>
  */
object StreamMain {

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, ckptDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.streaming.StreamExtract.availableNow(spark, inDir, outDir, ckptDir)
    q.awaitTermination()
    val n = spark.read.parquet(outDir).count()
    println(s"[stream] tick complete; total processed docs on sink: $n")
    spark.stop()
  }
}
