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
    * @param localContract run a partition-local union-find contraction
    *                  over the edge list before the iterative loop
    *                  (one narrow mapPartitions, no shuffle): each
    *                  partition's edges collapse to stars on the
    *                  partition-local component minimum. Connectivity
    *                  is preserved exactly — every original edge is
    *                  witnessed by the two star edges of its
    *                  partition — while intra-partition chains (LSH
    *                  buckets that land together) drop to diameter 2,
    *                  so the global loop starts from a FAR shallower
    *                  graph. Rounds are the serial axis of this
    *                  operator (each costs one driver-synchronized
    *                  job), and the per-round checkpoint traffic is
    *                  what saturates shared storage bandwidth at the
    *                  larger cluster size — the pre-pass attacks both.
    * @return (node, lbl) — lbl is the component's min vertex id
    */
  def run(vertices: DataFrame, vCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20,
      jumpDepth: Int = 1, localContract: Boolean = true): DataFrame = {
    val vset = vertices.select(col(vCol).as("node"))
    // endpoint gating on the ORIENTED edges (half the semi-join input
    // of gating the symmetrized table); the dst-then-src order leaves
    // the join output hash-partitioned by src — star hubs co-located —
    // which is exactly the layout the contraction pass collapses best
    val oriented = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(vset.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .join(vset.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .select(col("src"), col("dst"))
    // the contraction emits BOTH orientations in the same pass, so the
    // symmetrizing self-union (two references that would re-run the
    // semi-joins + contraction) disappears on that path
    val symRaw = (if (localContract) contractLocal(oriented)
      else oriented.unionByName(
        oriented.select(col("dst").as("src"), col("src").as("dst"))))
      .distinct()

    // ROW-WIDTH of the iterated state is what the loop pays for 10+
    // rounds of shuffle + checkpoint write + checkpoint re-read — on a
    // string-keyed corpus (16-char doc ids) every state row carries
    // three UTF8 strings where three longs would do, and at the larger
    // cluster size that traffic is exactly what saturates the shared
    // storage/memory bandwidth (BENCH.md round 5: the 2×4→4×4 collapse).
    // So non-integral vertex ids are remapped ONCE to dense longs whose
    // ORDER MATCHES the original type's (sort + zipWithIndex — an
    // order-preserving distributed ranking, the GraphX vertex-id
    // design), the loop runs ~3× narrower, and labels decode at exit.
    // min(id) ↔ min(node), so the min-label semantics are unchanged.
    val vtype = symRaw.schema("src").dataType
    val integral = vtype match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val (symEdges, idMapOpt) =
      if (integral) (symRaw, None)
      else {
        val endpoints = symRaw.select(col("src").as("node")).distinct()
        val idRdd = endpoints.orderBy("node").rdd.zipWithIndex()
          .map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i) }
        // lazily checkpointed: materializes inside the round-1 probe
        // job (it feeds the cached edge table) and is freed by the
        // caller's Bridge.freeLocalCheckpoint(result) walk, exactly
        // like the loop's own round checkpoints
        val idMap = vertices.sparkSession.createDataFrame(idRdd,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node", vtype, nullable = false),
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType, nullable = false))))
          .localCheckpoint(eager = false)
        val remapped = symRaw
          .join(idMap.select(col("node").as("src"), col("id").as("_sid")), Seq("src"))
          .join(idMap.select(col("node").as("dst"), col("id").as("_did")), Seq("dst"))
          .select(col("_sid").as("src"), col("_did").as("dst"))
        (remapped, Some(idMap))
      }
    val sym = symEdges
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
      // the final round's block (and the id-map checkpoint) would
      // otherwise outlive the failure (callers that swallow the throw —
      // best-of-N benches — would leak MEMORY_AND_DISK blocks per
      // failed attempt)
      Bridge.freeLocalCheckpoint(prevCheckpoint)
      idMapOpt.foreach(Bridge.freeLocalCheckpoint)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds — " +
          "the graph has a component whose min-vertex eccentricity exceeds " +
          "the bound; raise maxIter (silently returning split clusters " +
          "would make a dedup pipeline keep duplicates)")
    }
    // decode the dense long ids back to the caller's vertex values
    // (both columns ride the same checkpointed id map)
    val labelsOut = idMapOpt match {
      case None => labels
      case Some(idMap) =>
        labels
          .join(idMap.select(col("id").as("node"), col("node").as("_nv")), Seq("node"))
          .join(idMap.select(col("id").as("lbl"), col("node").as("_lv")), Seq("lbl"))
          .select(col("_nv").as("node"), col("_lv").as("lbl"))
    }
    // vertices outside every edge are their own components
    val untouched = vertices.select(col(vCol).as("node"))
      .join(labelsOut.select(col("node")), Seq("node"), "left_anti")
      .withColumn("lbl", col("node"))
    labelsOut.unionByName(untouched)
  }

  /** Partition-local union-find contraction (the "local aggregation"
    * trick of the MapReduce-CC literature): within each partition,
    * union every edge's endpoints, then emit star edges from every
    * member to its local component representative — BOTH orientations,
    * so the caller needs no symmetrizing self-union. Narrow (zero
    * shuffle), one pass, memory bounded by the partition's distinct
    * endpoint count. The representative is the component's MIN member
    * when the id type is orderable (accelerates the global min-label
    * loop); for exotic types it falls back to an arbitrary root, which
    * is still CORRECT — the loop computes the true minimum either way,
    * the choice only affects convergence speed. Output size is at most
    * 2·(distinct endpoints per partition), ≤ the symmetrized input and
    * usually far smaller on bucket-clustered candidate graphs. */
  private[graft] def contractLocal(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val schema = e.schema
    val ord: Ordering[Any] = e.schema.head.dataType match {
      case org.apache.spark.sql.types.StringType =>
        Ordering.by((a: Any) => a.asInstanceOf[String])
      case org.apache.spark.sql.types.LongType =>
        Ordering.by((a: Any) => a.asInstanceOf[Long])
      case org.apache.spark.sql.types.IntegerType =>
        Ordering.by((a: Any) => a.asInstanceOf[Int])
      case org.apache.spark.sql.types.ShortType =>
        Ordering.by((a: Any) => a.asInstanceOf[Short])
      case _ => null
    }
    val rows = e.rdd.mapPartitions { it =>
      val parent = new java.util.HashMap[Any, Any]()
      // find with path halving; roots map to themselves (every vertex
      // is inserted on first sight, so lookups of a present key never
      // return null)
      def find(x0: Any): Any = {
        var x = x0
        var p = parent.get(x)
        if (p == null) { parent.put(x, x); return x }
        while (p != x) {
          val gp = parent.get(p)
          parent.put(x, gp)
          x = gp
          p = parent.get(x)
        }
        x
      }
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val ru = find(r.get(0))
          val rv = find(r.get(1))
          if (ru != rv) parent.put(ru, rv)
        }
      }
      import scala.jdk.CollectionConverters._
      val keys = parent.keySet().asScala.toArray
      val repr = new java.util.HashMap[Any, Any]()
      keys.foreach { v =>
        val root = find(v)
        if (ord != null) {
          val cur = repr.get(root)
          if (cur == null || ord.lt(v, cur)) repr.put(root, v)
        } else repr.put(root, root)
      }
      keys.iterator.flatMap { v =>
        val m = repr.get(find(v))
        if (m == v) Iterator.empty
        else Iterator(org.apache.spark.sql.Row(v, m),
          org.apache.spark.sql.Row(m, v))
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
