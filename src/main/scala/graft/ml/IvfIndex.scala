package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sql.CosineSim

/** IVF (inverted-file) approximate-nearest-neighbor index with the
  * production lifecycle split the 10^9-vector scale path demands:
  *
  *  1. [[train]] — k-means coarse quantizer, fit ONCE over a (sampled)
  *     embedding table;
  *  2. [[save]]/[[load]] — centroids persisted as a tiny parquet table
  *     (k rows), the queryable artifact;
  *  3. [[assign]]/[[search]] — pure Catalyst: broadcast the centroids,
  *     argmax-assign each vector to a cell, probe the query's nearest
  *     `nProbe` cells, exact cosine inside them. No model object, no
  *     `.fit`, no driver round-trip at query time.
  *
  * The driver-contract demo of the same architecture with a
  * deterministic medoid quantizer (SQL-expressible, DuckDB-oracled) is
  * `q38_ann_ivf` in [[graft.queries.Queries]].
  */
object IvfIndex {

  /** Train the coarse quantizer once. Input: (id, e: array<double>).
    * Output: centroid table (cell: int, centroid: array<double>). */
  def train(emb: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = emb.sparkSession
    import spark.implicits._
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      // spherical k-means: assign/search partition by COSINE, so the
      // quantizer must learn the same geometry (Euclidean centroids
      // scatter same-direction/different-magnitude vectors across
      // cells and cost recall at fixed nProbe)
      .setDistanceMeasure("cosine")
      .setFeaturesCol("features")
      .fit(emb.select(array_to_vector(col("e")).as("features")))
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
  }

  def save(centroids: DataFrame, path: String): Unit =
    centroids.coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Assign every vector to its max-cosine cell. Zero-shuffle: the
    * centroid table is tiny by design (k rows — it IS the persisted
    * index artifact), so it is materialized once driver-side and the
    * argmax becomes a per-row `greatest(struct(cos, -cell, cell))`
    * over literal centroid arrays — a narrow projection, no Exchange
    * (the crossJoin+groupBy formulation this replaces multiplied the
    * corpus ×k and exchanged every vector once; guarded by
    * PlanShapeSpec "IVF assignment is a narrow projection"). Ties on
    * equal cosine go to the smallest cell. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "empty centroid table")
    val scored = cents.toSeq.map { case (cell, c) =>
      struct(CosineSim(col("e"), typedLit(c)).as("cs"),
        lit(-cell).as("neg_cell"), lit(cell).as("cell"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    emb.select(col("id"), best.getField("cell").as("cell"), col("e"))
  }

  /** Top-k neighbors of `query` (a one-row DataFrame with column `qe`)
    * probing the `nProbe` nearest cells of a pre-assigned table.
    * `excludeId` drops that id from the candidates — pass the query's
    * own id when it comes from the indexed corpus, or its self-match
    * (cos=1.0) consumes a top-k slot. */
  def search(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
      nProbe: Int, topK: Int, excludeId: Option[Long] = None): DataFrame = {
    val probe = query.crossJoin(broadcast(centroids))
      .withColumn("cs", CosineSim(col("qe"), col("centroid")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(desc("cs"), col("cell"))))
      .filter(col("rk") <= nProbe)
      .select(col("cell"))
    val candidates = excludeId match {
      case Some(id) => assigned.filter(col("id") =!= id)
      case None     => assigned
    }
    candidates.join(broadcast(probe), Seq("cell"))
      .crossJoin(broadcast(query))
      .withColumn("cos", CosineSim(col("e"), col("qe")))
      .orderBy(desc("cos"), col("id"))
      .select(col("id"), col("cell"), col("cos"))
      .limit(topK)
  }
}
