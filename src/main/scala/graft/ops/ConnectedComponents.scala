package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Distributed connected components over an undirected edge list —
  * the step that turns near-dup candidate PAIRS (minhash-LSH banding,
  * [[graft.dedup.MinHashLsh]]) into dedup CLUSTERS with a canonical
  * survivor per component, which is what a training-data pipeline
  * actually keeps.
  *
  * Algorithm: min-label propagation WITH POINTER JUMPING (the
  * hash-to-min family — Rastogi et al., "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds"). Every vertex starts labeled
  * with itself; each round a vertex takes the min over its own label,
  * its neighbors' labels (1-hop spread), and its LABEL'S label (the
  * pull half of pointer doubling), and PUSHES its improved label back
  * to the vertex it pointed at last round (the push half — without
  * it, mins cross between pointer-chain basins only via neighbor
  * edges at one hop per round; measured 17 rounds vs 11 at 2M docs).
  * Per round: two shuffle joins + one map-side-combined aggregate
  * over two narrow columns; stop at fixpoint.
  *
  * The jump is not optional at scale: star-edge candidate graphs
  * ([[graft.dedup.MinHashLsh.bandStarEdges]]) replace intra-bucket
  * cliques with hub stars, and overlapping buckets CHAIN those stars —
  * the 2M-doc bench corpus builds components whose min-vertex
  * eccentricity exceeds 20, where plain 1-hop propagation (this
  * operator's first version) blew through its round budget. If the
  * graph still does not converge within `maxIter`, run() THROWS
  * rather than silently returning split components (a dedup pipeline
  * acting on split clusters would keep duplicates).
  *
  * Storage discipline: every round is truncated with a
  * `localCheckpoint` (persist()-based loops are fragile — downstream
  * re-references can miss cache substitution and replay the full edge
  * lineage). The per-round checkpoint is marked LAZILY and
  * materialized by the fixpoint probe's count, so a round costs one
  * driver-synchronized job, not two — the driver sync is the serial
  * fraction that caps multi-executor scaling of iterative stages. The
  * PREVIOUS round's block is freed as soon as the next one is
  * materialized ([[Bridge.freeLocalCheckpoint]] — plain
  * `unpersist()` cannot release checkpoint storage). The returned
  * labels keep only the final round's block — after forcing (or
  * persisting) the result, callers that loop (benchmarks, repeated
  * dedup passes) should release that block too with
  * `Bridge.freeLocalCheckpoint(result)`; it walks the derived plan
  * and unpersists the backing RDD.
  */
object ConnectedComponents {

  /** @param vertices one row per vertex (isolated vertices become
    *                 singleton components). Defines the vertex set:
    *                 edges with an endpoint OUTSIDE it are ignored
    *                 (components are computed among `vertices` only),
    *                 at the one-time cost of two endpoint semi-joins.
    * @param vCol     vertex id column in `vertices`
    * @param edges    undirected edge list (any orientation, dups ok)
    * @param srcCol   edge endpoint column
    * @param dstCol   edge endpoint column
    * @param maxIter  round bound; exceeding it throws (see above)
    * @param jumpDepth pointer-jump compositions per round (reach
    *                  l^(jumpDepth+1)). Measured at 2M docs: depth 1
    *                  (classic pointer doubling) converges in 11
    *                  rounds vs 10 at depth 2/4, so deeper chases buy
    *                  at most one round while each extra composition
    *                  adds a join stage (and its AQE re-plan) to EVERY
    *                  round — depth 1 was 23% faster end-to-end than
    *                  depth 4. Depth 0 (no chase) does NOT converge:
    *                  the chase is what doubles pointers.
    * @return (node, lbl) — lbl is the component's min vertex id
    */
  def run(vertices: DataFrame, vCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20,
      jumpDepth: Int = 1): DataFrame = {
    val vset = vertices.select(col(vCol).as("node"))
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      // edges are only meaningful between vertices of the given set
      .join(vset.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(vset.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .distinct()
      // co-locate the STATIC side of the per-round neighbor join ONCE:
      // distinct() leaves sym hash-partitioned by (src, dst), which the
      // join on src cannot reuse — without this, every round re-shuffles
      // the whole edge table (the largest per-round input) and pays that
      // exchange's stage barrier. The cached InMemoryRelation preserves
      // hashpartitioning(src), so each round only exchanges the labels.
      .repartition(col("src"))
      .persist() // cache-managed: the final result's lineage is
                 // checkpoint-backed, so this is safe to free below
    // only vertices that touch an edge can ever change label — iterate
    // over THAT subgraph and union everyone else back as singletons at
    // the end. In a near-dup corpus the candidate-pair endpoints are a
    // tiny fraction of the documents, so the per-round state shrinks
    // from |V| to |endpoints|.
    // every checkpoint is rebuilt WITHOUT origin statistics
    // (Bridge.dropOriginStats): the round plan self-joins the previous
    // checkpoint several times, and Catalyst's join size estimate
    // multiplies child sizes — with propagated stats the estimate
    // compounds exponentially across rounds until the driver spends
    // minutes in BigInteger math during planning (measured hang at 2M
    // docs with the l³ jump below)
    var prevCheckpoint = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .withColumn("prev", col("node"))
      .localCheckpoint()
    var state = Bridge.dropOriginStats(prevCheckpoint)
    var labels = state.select(col("node"), col("lbl"))

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("lbl"), lit(0).as("own"))
      // pointer jump: my label's label, composed `jumpDepth` times.
      // Each composition multiplies per-round reach (l², l³, …):
      // convergence drops from log₂ to ~log_(depth+1) of the
      // eccentricity. The joins are parallel work over the SMALL label
      // table; what they buy is FEWER ROUNDS, and each round carries
      // fixed driver-synchronized cost (job scheduling, checkpoint
      // materialization, the fixpoint probe) — the serial fraction
      // that caps multi-executor scaling of the iterative stage.
      // Label chasing is monotone (a vertex's label never exceeds its
      // id, so l(l(x)) ≤ l(x)) — only the DEEPEST composition needs to
      // enter the aggregate; the intermediates are join scaffolding.
      var deepJump = labels.select(col("node"), col("lbl"))
      for (d <- 1 to jumpDepth) {
        val m = labels.select(col("node").as(s"_j$d"), col("lbl").as(s"_l$d"))
        deepJump = deepJump
          .join(m, deepJump("lbl") === col(s"_j$d"))
          .select(deepJump("node"), col(s"_l$d").as("lbl"))
      }
      // PUSH (hash-to-min's second half): pulling down the pointer
      // chain alone leaves "local minimum" basins that a component min
      // can only cross via neighbor edges at ONE hop per round —
      // measured 17 rounds at 2M docs with pull-only, any jump depth.
      // Each vertex therefore also SENDS its improved label UP to the
      // vertex it pointed at last round, and the chase spreads it back
      // down — the two-way flow that makes hash-to-min logarithmic
      // (Rastogi et al. §3). The checkpoint already carries last
      // round's label as `prev`, so the push is a projection of state
      // the round already has: zero joins, just |V| extra rows riding
      // the existing aggregate shuffle.
      val viaPush = state
        .select(col("prev").as("node"), col("lbl"), lit(0).as("own"))
      // the vertex's previous label rides along as `own=1`, so the SAME
      // aggregate yields both the new label and the fixpoint signal —
      // no extra probe join/shuffle per round
      val next = labels.select(col("node"), col("lbl"), lit(1).as("own"))
        .unionByName(viaNeighbors)
        .unionByName(deepJump.withColumn("own", lit(0)))
        .unionByName(viaPush)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"),
          min(when(col("own") === 1, col("lbl"))).as("prev"))
        // LAZY checkpoint: the fixpoint probe below is the materializing
        // action, so each round schedules ONE driver-synchronized job
        // instead of two (eager materialization + probe). The probe must
        // be a full count — isEmpty is a take(1) that can stop after one
        // partition and would leave the checkpoint partially stored.
        .localCheckpoint(eager = false)
      val nextClean = Bridge.dropOriginStats(next)
      converged =
        nextClean.filter(col("lbl") =!= col("prev")).count() == 0L
      Bridge.freeLocalCheckpoint(prevCheckpoint)
      prevCheckpoint = next
      state = nextClean
      labels = nextClean.select(col("node"), col("lbl"))
      iter += 1
    }
    sym.unpersist(blocking = false)
    // rounds are the serial axis of this operator — surface the count
    // for scaling diagnostics (stderr, not the result)
    System.err.println(s"[graft.cc] converged=$converged rounds=$iter jumpDepth=$jumpDepth")
    if (!converged) {
      // the final round's block would otherwise outlive the failure
      // (callers that swallow the throw — best-of-N benches — would
      // leak one MEMORY_AND_DISK block per failed attempt)
      Bridge.freeLocalCheckpoint(prevCheckpoint)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds — " +
          "the graph has a component whose min-vertex eccentricity exceeds " +
          "the bound; raise maxIter (silently returning split clusters " +
          "would make a dedup pipeline keep duplicates)")
    }
    // vertices outside every edge are their own components
    val untouched = vertices.select(col(vCol).as("node"))
      .join(labels.select(col("node")), Seq("node"), "left_anti")
      .withColumn("lbl", col("node"))
    labels.unionByName(untouched)
  }
}
