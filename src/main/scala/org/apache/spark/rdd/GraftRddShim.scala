package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is package-private; the graft bridge
  * needs it to distinguish checkpoint-backed LogicalRDDs (safe to
  * free) from `createDataFrame(rdd)`-sourced ones a caller may have
  * persisted intentionally. Same in-package shim pattern as
  * [[org.apache.spark.sql.graftbridge.Bridge]].
  */
object GraftRddShim {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
