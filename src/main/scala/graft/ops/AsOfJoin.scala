package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** As-of join — for each left row, the closest right row in the same
  * key group under one of three direction rules (the pandas
  * `merge_asof` / QuestDB `ASOF JOIN` family):
  *
  *  - `backward` (default): latest right with `right.ts <= left.ts`;
  *  - `forward`: earliest right with `right.ts >= left.ts`;
  *  - `nearest`: whichever of the two is closer (tie → backward);
  *
  * optionally bounded by a `tolerance` — a candidate farther than
  * `toleranceSecs` from the left timestamp yields a null match.
  *
  * Spark has no native as-of operator; the naive formulations are a
  * range self-join (quadratic blow-up inside hot keys) or a per-key
  * collect. This one is the scale shape: tag both sides, UNION them,
  * and take a running `last(ignoreNulls)` of the right-side payload
  * over a key-partitioned window — ONE exchange on the key, zero
  * joins, O(n log n) in-partition sort, mega-key skew handled like any
  * other window (AQE/salting), never O(n·m). `forward` is the same
  * window with the ordering reversed; `nearest` evaluates both
  * directions over the SAME exchange (two sorts, one shuffle).
  *
  * Tie semantics: a right row AT the left row's timestamp matches in
  * every direction; among right rows with equal timestamps the largest
  * payload struct (ordered by `rightTs ++ carry`) wins. Both rules are
  * deterministic and mirrored in the q51/q59 DuckDB oracles.
  */
object AsOfJoin {

  /** @param left    probe side (all its columns are carried through)
    * @param right   reference side
    * @param key     equi-key column name present on both sides
    * @param leftTs  left timestamp/ordering column name
    * @param rightTs right timestamp/ordering column name
    * @param carry   right columns to carry into the output `asof`
    *                struct (alongside `rightTs`); null struct when no
    *                right row matches the direction/tolerance rule
    * @param direction `backward` | `forward` | `nearest`
    * @param toleranceSecs max |left.ts - right.ts| (seconds for
    *                timestamp columns, plain units for numeric ones);
    *                matches beyond it become null
    * @param allowExactMatches pandas-compatible knob: when false the
    *                boundary is strict (`<` / `>`) — right rows AT the
    *                left timestamp no longer match
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String],
      direction: String = "backward",
      toleranceSecs: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val rStruct = struct((rightTs +: carry).map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema.head.dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("_l")).schema.head.dataType

    val lt = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(0).as("_isR"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val rt = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(1).as("_isR"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // numeric view of a timestamp for gap math (TIMESTAMP_NTZ can't
    // cast to double directly — route through TIMESTAMP first)
    val tsNum: Column => Column = left.schema(leftTs).dataType match {
      case TimestampNTZType | TimestampType =>
        c => c.cast("timestamp").cast("double")
      case _ => c => c.cast("double")
    }

    // right rows sort BEFORE left rows at the same _ts (desc _isR) so
    // the running last() makes the boundary inclusive in BOTH
    // directions — or AFTER them (asc _isR) for the strict boundary
    // when exact matches are disallowed; equal-ts right rows resolve
    // by ascending payload struct (largest wins as the last seen)
    val sameTsRightsFirst =
      if (allowExactMatches) desc("_isR") else asc("_isR")
    val wBack = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), sameTsRightsFirst, col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("_k"))
      .orderBy(desc("_ts"), sameTsRightsFirst, col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val u = lt.unionByName(rt)
    val withCand = direction match {
      case "backward" =>
        u.withColumn("_cand", last(col("_r"), ignoreNulls = true).over(wBack))
      case "forward" =>
        u.withColumn("_cand", last(col("_r"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        u.withColumn("_b", last(col("_r"), ignoreNulls = true).over(wBack))
          .withColumn("_f", last(col("_r"), ignoreNulls = true).over(wFwd))
          .withColumn("_cand",
            when(col("_b").isNull, col("_f"))
              .when(col("_f").isNull, col("_b"))
              // tie (equal gap) → backward, the pandas convention
              .when(tsNum(col("_ts")) - tsNum(col("_b")(rightTs)) <=
                tsNum(col("_f")(rightTs)) - tsNum(col("_ts")), col("_b"))
              .otherwise(col("_f")))
    }
    val gap = abs(tsNum(col("_ts")) - tsNum(col("_cand")(rightTs)))
    val asofCol = toleranceSecs
      .map(tol => when(gap <= tol, col("_cand")))
      .getOrElse(col("_cand"))

    withCand
      .filter(col("_isR") === 0)
      .select(col("_l.*"), asofCol.as("asof"))
  }
}
