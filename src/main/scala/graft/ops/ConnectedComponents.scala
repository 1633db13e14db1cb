package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the step that turns near-dup candidate PAIRS (minhash-LSH banding,
  * [[graft.dedup.MinHashLsh]]) into dedup CLUSTERS with a canonical
  * survivor per component, which is what a training-data pipeline
  * actually keeps.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round every vertex takes the min of its
  * own label and its neighbors' labels (one shuffle join + one
  * map-side-combined aggregate per round over two narrow columns);
  * stop at fixpoint. Rounds needed = the largest component's
  * DIAMETER.
  *
  * Scale rationale: near-dup graphs are forests of tiny, dense
  * clusters (diameter 2–4), so plain propagation converges in a
  * handful of rounds and beats the large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which pays two extra shuffles per round to guarantee O(log n)
  * rounds on ADVERSARIAL graphs — a long-chain topology no LSH output
  * produces. `maxIter` bounds the pathological case anyway; each
  * round's state is exactly |V| rows of (node, label), never edges ×
  * labels materialized.
  */
object ConnectedComponents {

  /** @param vertices one row per vertex (isolated vertices become
    *                 singleton components)
    * @param vCol     vertex id column in `vertices`
    * @param edges    undirected edge list (any orientation, dups ok)
    * @param srcCol   edge endpoint column
    * @param dstCol   edge endpoint column
    * @param maxIter  round bound for adversarial topologies
    * @return (node, lbl) — lbl is the component's min vertex id
    */
  def run(vertices: DataFrame, vCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    // lineage is truncated with eager localCheckpoint at every step —
    // the standard tool for iterative DataFrame algorithms: each
    // round's plan references the STORED blocks of the previous round
    // directly, so re-references never replay the (expensive) edge
    // derivation and the plan does not grow with the iteration count
    // (persist() alone is fragile here: downstream plans may fail
    // cache substitution and silently recompute the whole lineage).
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // only vertices that touch an edge can ever change label — iterate
    // over THAT subgraph and union everyone else back as singletons at
    // the end. In a near-dup corpus the candidate-pair endpoints are a
    // tiny fraction of the documents, so the per-round state shrinks
    // from |V| to |endpoints|.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("lbl"), lit(0).as("own"))
      // the vertex's previous label rides along as `own=1`, so the SAME
      // aggregate yields both the new label and the fixpoint signal —
      // no extra probe join/shuffle per round
      val next = labels.select(col("node"), col("lbl"), lit(1).as("own"))
        .unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"),
          min(when(col("own") === 1, col("lbl"))).as("prev"))
        .localCheckpoint()
      converged = next.filter(col("lbl") =!= col("prev")).isEmpty
      labels = next.select(col("node"), col("lbl"))
      iter += 1
    }
    // vertices outside every edge are their own components
    val untouched = vertices.select(col(vCol).as("node"))
      .join(labels.select(col("node")), Seq("node"), "left_anti")
      .withColumn("lbl", col("node"))
    labels.unionByName(untouched)
  }
}
