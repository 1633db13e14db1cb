package graft

import org.apache.spark.sql.functions._

import graft.ml.IvfIndex

/** IVF index lifecycle: train once → persist → load → pure-Catalyst
  * serve. The correctness anchor: probing ALL cells must reproduce the
  * brute-force top-k exactly (IVF with full probe is exhaustive
  * search), and the persisted artifact must round-trip. */
class IvfIndexSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("e"))

  test("train once, persist, load, serve — full probe == brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val k = 8
    val centroids = IvfIndex.train(emb, k, seed = 42L, maxIter = 10)
    IvfIndex.save(centroids, s"$tmp/centroids")
    val loaded = IvfIndex.load(spark, s"$tmp/centroids")
    assert(loaded.count() == k)

    val assigned = IvfIndex.assign(emb.filter(col("id") =!= 0), loaded)
    val query = emb.filter(col("id") === 0).select(col("e").as("qe"))

    // probing every cell = exhaustive search → must equal brute force
    val full = IvfIndex.search(assigned, loaded, query, nProbe = k, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val brute = emb.filter(col("id") =!= 0).crossJoin(broadcast(query))
      .withColumn("cos", graft.sql.CosineSim(col("e"), col("qe")))
      .orderBy(desc("cos"), col("id"))
      .limit(10).collect().map(r => (r.getLong(0), r.getAs[Double]("cos")))
    assert(full.toSeq == brute.toSeq)

    // partial probe: still returns topK rows, each from a probed cell,
    // scores monotonically non-increasing
    val part = IvfIndex.search(assigned, loaded, query, nProbe = 3, topK = 10)
      .collect()
    assert(part.length == 10)
    val scores = part.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })

    // the serving plan contains no KMeans fit: it is a pure DataFrame
    // chain over the persisted centroid table (nothing to assert at
    // runtime — the API gives query time no access to the trainer)
  }

  test("recall grows monotonically with nProbe, reaching exact at full probe") {
    val k = 8
    val centroids = IvfIndex.train(emb, k, seed = 42L, maxIter = 10)
    val assigned = IvfIndex.assign(emb.filter(col("id") =!= 0), centroids)
    val query = emb.filter(col("id") === 0).select(col("e").as("qe"))
    val brute = emb.filter(col("id") =!= 0).crossJoin(broadcast(query))
      .withColumn("cos", graft.sql.CosineSim(col("e"), col("qe")))
      .orderBy(desc("cos"), col("id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val recalls = Seq(1, 3, k).map { np =>
      val ids = IvfIndex.search(assigned, centroids, query, np, topK = 10)
        .collect().map(_.getLong(0)).toSet
      (brute & ids).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone in nProbe: $recalls")
    assert(recalls.last == 10, s"full probe missed neighbors: $recalls")
  }

  test("assignment is deterministic and total") {
    val centroids = IvfIndex.train(emb, 4, seed = 7L, maxIter = 5)
    val a1 = IvfIndex.assign(emb, centroids).select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val a2 = IvfIndex.assign(emb, centroids).select("id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a1 == a2)
    assert(a1.size == emb.count())
  }
}
