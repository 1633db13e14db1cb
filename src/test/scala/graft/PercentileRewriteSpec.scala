package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q40's relational exact-percentile rewrite against the
  * `percentile()` aggregate it replaced — bit-identical doubles
  * required, since the DuckDB oracle replays Spark's interpolation
  * arithmetic. Covers interpolated and integral positions, tied
  * bracket values, and single-row groups. */
class PercentileRewriteSpec extends SparkSpecBase {

  private def viaAggregate(li: DataFrame): DataFrame = li
    .groupBy(col("l_returnflag"))
    .agg(
      round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
      round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"),
      round(min(col("l_extendedprice")), 2).as("lo"),
      round(max(col("l_extendedprice")), 2).as("hi"))
    .orderBy(col("l_returnflag"))

  private def viaRewrite(li: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"))
    val stats = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("vmin"),
        max(col("l_extendedprice")).as("vmax"))
    val ranked = li
      .select(col("l_returnflag"), col("l_extendedprice"),
        (row_number().over(wOrd).cast("bigint") - 1).as("i"))
      .join(broadcast(stats), Seq("l_returnflag"))
      .withColumn("pos50", lit(0.5) * (col("n") - 1).cast("double"))
      .withColumn("pos90", lit(0.9) * (col("n") - 1).cast("double"))
    def interp(posC: org.apache.spark.sql.Column,
        lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column) =
      when((ceil(posC) === floor(posC)) || (lo === hi), lo)
        .otherwise((ceil(posC) - posC) * lo + (posC - floor(posC)) * hi)
    ranked
      .filter(col("i") === floor(col("pos50")) || col("i") === ceil(col("pos50")) ||
        col("i") === floor(col("pos90")) || col("i") === ceil(col("pos90")))
      .groupBy(col("l_returnflag"))
      .agg(first(col("pos50")).as("pos50"), first(col("pos90")).as("pos90"),
        first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"),
        max(when(col("i") === floor(col("pos50")), col("l_extendedprice"))).as("lo50"),
        max(when(col("i") === ceil(col("pos50")), col("l_extendedprice"))).as("hi50"),
        max(when(col("i") === floor(col("pos90")), col("l_extendedprice"))).as("lo90"),
        max(when(col("i") === ceil(col("pos90")), col("l_extendedprice"))).as("hi90"))
      .select(col("l_returnflag"),
        round(interp(col("pos50"), col("lo50"), col("hi50")), 2).as("p50"),
        round(interp(col("pos90"), col("lo90"), col("hi90")), 2).as("p90"),
        round(col("vmin"), 2).as("lo"),
        round(col("vmax"), 2).as("hi"))
      .orderBy(col("l_returnflag"))
  }

  private def rows(df: DataFrame) = df.collect().toSeq.map(_.toSeq)

  test("rewrite == percentile() aggregate on crafted edge groups") {
    import spark.implicits._
    val li = Seq(
      // 4 values: pos50 = 1.5 → interpolate between 2 equal middles
      ("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 7.0),
      // single row: pos = 0 integral
      ("B", 42.42),
      // 5 values: pos50 integral (2.0), pos90 = 3.6 interpolated
      ("C", 0.1), ("C", 0.2), ("C", 0.30000000000000004),
      ("C", 95471.295), ("C", 52724.245),
      // all equal
      ("D", 3.14), ("D", 3.14), ("D", 3.14),
      // 2 values: pos50 = .5, pos90 = .9 — both interpolated
      ("E", -1.25), ("E", 1.75)
    ).toDF("l_returnflag", "l_extendedprice")
    assert(rows(viaRewrite(li)) == rows(viaAggregate(li)))
  }

  test("rewrite == percentile() aggregate on sf0.01 lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    assert(rows(viaRewrite(li)) == rows(viaAggregate(li)))
  }
}
