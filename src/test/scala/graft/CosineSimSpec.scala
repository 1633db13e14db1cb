package graft

import org.apache.spark.sql.functions._

import graft.sql.CosineSim

/** Codegen'd cosine expression: value parity with the HOF composition
  * and correct null/edge behavior. */
class CosineSimSpec extends SparkSpecBase {

  test("CosineSim == zip_with/aggregate composition on real embeddings") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.filter($"vec_id" === 1).select($"e".as("qe"))
    val hof = {
      val dot = aggregate(zip_with($"e", $"qe", (x, y) => x * y), lit(0.0), _ + _)
      val na = sqrt(aggregate(transform($"e", x => x * x), lit(0.0), _ + _))
      val nb = sqrt(aggregate(transform($"qe", x => x * x), lit(0.0), _ + _))
      dot / (na * nb)
    }
    val rows = emb.crossJoin(broadcast(q))
      .select($"vec_id", CosineSim($"e", $"qe").as("fast"), hof.as("ref"))
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (id, fast, ref) =>
      assert(math.abs(fast - ref) < 1e-12, s"vec $id: $fast vs $ref")
    }
    // self-similarity is exactly the same computation on both paths
    assert(rows.find(_._1 == 1L).exists(r => math.abs(r._2 - 1.0) < 1e-12))
  }

  test("CosineSim edge cases: null, zero vector, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0)), "same"),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0)), "zero"),
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0)), "len"),
      (None, Some(Seq(1.0, 2.0)), "null")
    ).toDF("a", "b", "tag")
    val out = df.select($"tag", CosineSim($"a", $"b").as("c"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(math.abs(out("same").get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out("zero").get == 0.0)
    assert(out("len").get == 0.0)
    assert(out("null").isEmpty)
  }

  test("the similarity plan stays inside whole-stage codegen") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val q = emb.filter($"vec_id" === 0).select($"e".as("qe"))
    val df = emb.crossJoin(broadcast(q)).select(CosineSim($"e", $"qe").as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }
}
