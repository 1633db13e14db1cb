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
    * holds). No-op for plans with no checkpoint-backed node. */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
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
