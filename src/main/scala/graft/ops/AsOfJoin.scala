package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group. Spark has no native
  * as-of operator; the naive formulations are a range self-join
  * (quadratic blow-up inside hot keys) or a per-key collect. This one
  * is the scale shape: tag both sides, UNION them, and take a
  * running `last(ignoreNulls)` of the right-side payload over one
  * window — a single exchange on the key, zero joins, O(n log n)
  * in-partition sort, mega-key skew handled like any other window
  * (AQE/salting), never O(n·m).
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (`<=`); among right rows with equal timestamps the largest payload
  * struct (ordered by `rightTs ++ carry`) wins. Both rules are
  * deterministic and mirrored in the q51 DuckDB oracle.
  */
object AsOfJoin {

  /** @param left    probe side (all its columns are carried through)
    * @param right   reference side
    * @param key     equi-key column name present on both sides
    * @param leftTs  left timestamp/ordering column name
    * @param rightTs right timestamp/ordering column name
    * @param carry   right columns to carry into the output `asof`
    *                struct (alongside `rightTs`); null struct when no
    *                right row is at-or-before the left row
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val rStruct = struct((rightTs +: carry).map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema.head.dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("_l")).schema.head.dataType

    val lt = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(0).as("_isR"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rt = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(1).as("_isR"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // right rows sort BEFORE left rows at equal _ts (desc _isR) so the
    // running last() implements `<=`; equal-ts right rows resolve by
    // ascending payload struct (largest wins as the last seen)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), desc("_isR"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lt.unionByName(rt)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_isR") === 0)
      .select(col("_l.*"), col("_asof").as("asof"))
  }
}
