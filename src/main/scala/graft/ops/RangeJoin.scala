package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via binning — the standard rewrite that turns
  * a theta-join (`point BETWEEN start AND end`), which Spark can only
  * execute as a nested-loop, into an EQUI-join Catalyst can hash or
  * sort-merge: intervals explode to the fixed-width bins they cover, a
  * point lands in exactly one bin, the join key is the bin, and the
  * exact predicate re-filters inside the bin. Pair work is bounded by
  * bin occupancy × interval span, never |points| × |intervals|; the
  * explode factor is span/binWidth, so pick binWidth near the typical
  * interval length. A point lies in ONE bin, so no post-join dedup is
  * needed.
  */
object RangeJoin {

  /** Join `points` (numeric position `posCol`) to every interval of
    * `intervals` (half-open `[startCol, endCol)`) that contains it.
    * Output: all columns of both inputs. Broadcast of a tiny interval
    * side still applies (the bin key is broadcastable like any other);
    * two big sides get a plain hash exchange on the bin. */
  def pointInInterval(points: DataFrame, posCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(posCol) / binWidth))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(col(startCol) / binWidth),
      // last covered bin of a half-open interval: ceil(end/g)-1, which
      // is end/g - 1 on aligned ends and floor(end/g) otherwise; never
      // before the first bin (degenerate e<=s intervals keep one bin)
      greatest(floor(col(startCol) / binWidth),
        ceil(col(endCol) / binWidth) - 1))))
    p.join(iv, Seq("_bin"))
      .filter(col(posCol) >= col(startCol) && col(posCol) < col(endCol))
      .drop("_bin")
  }
}
