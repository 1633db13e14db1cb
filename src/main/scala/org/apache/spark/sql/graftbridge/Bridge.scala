package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (ExpressionUtils in columnNodeSupport.scala); custom
  * Catalyst expressions still need them to surface as user-facing
  * Columns, hence this in-package shim — the standard pattern for
  * Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the storage behind an eagerly `localCheckpoint()`ed
    * Dataset. `Dataset.unpersist()` only talks to the CacheManager,
    * which does not track checkpoint blocks — without this, iterative
    * algorithms leak one MEMORY_AND_DISK block per round until the
    * driver GC + ContextCleaner get around to it. Walks the whole
    * analyzed plan, so it also frees checkpoints buried under derived
    * projections/unions (e.g. the labels a ConnectedComponents caller
    * holds). Only RDDs that are actually locally checkpointed are
    * touched — a LogicalRDD can also back `createDataFrame(rdd)` data
    * a caller persisted intentionally, and yanking that storage from
    * under another live DataFrame would silently replay (or break) its
    * lineage. No-op for plans with no checkpoint-backed node. */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD
          if org.apache.spark.rdd.GraftRddShim.isLocallyCheckpointed(lr.rdd) =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Rebuild a checkpoint-backed DataFrame WITHOUT its origin
    * statistics. `Dataset.localCheckpoint` produces a LogicalRDD that
    * carries the stats of the plan it truncated — and Catalyst's
    * size-in-bytes join estimate MULTIPLIES child sizes, so an
    * iterative algorithm whose round plan self-joins the previous
    * round's checkpoint k times compounds the estimate to
    * size^(k^rounds): the BigInt grows exponentially MANY DIGITS per
    * round and the driver ends up burning whole minutes inside
    * BigInteger.multiplyToomCook3 during stats estimation (observed:
    * the 2M-doc clustering bench hung the driver at 100% CPU after
    * adding a second pointer-jump join). Dropping originStats resets
    * each round to the default size estimate — plan COST is
    * unaffected (no broadcast decisions hinge on these inflated
    * numbers; they exceed every threshold either way). No-op for
    * non-checkpoint-rooted plans. */
  def dropOriginStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val clean = org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(session, None, None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, clean)
      case _ => df
    }

  /** A sibling SparkSession on the same SparkContext with the given
    * extensions applied — Spark only applies extensions at session
    * construction, and `getOrCreate` returns the existing session, so
    * tests (and embedders that join a live context) need this hook. */
  def sessionWithExtensions(
      sc: org.apache.spark.SparkContext,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit): SparkSession =
    org.apache.spark.sql.classic.GraftSessionShim.withExtensions(sc, configure)
}
