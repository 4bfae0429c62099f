package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine_similarity, dot_product}
import graft.sim.Similarity

class VectorExprSpec extends SparkSpec {

  import spark.implicits._

  /** Reference higher-order-function cosine (the formulation the codegen'd
    * expression replaced) — kept here as the independent numeric oracle. */
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(x.cast("array<double>"), y.cast("array<double>"), (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v)
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))
  }

  test("codegen cosine matches the higher-order-function formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      cosine_similarity(col("embedding"), col("qe")).as("fast"),
      hofCosine(col("embedding"), col("qe")).as("hof"))
    // Same left-to-right double accumulation => exactly equal, not just close.
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("codegen cosine handles double arrays, zero norms, and nulls") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0, 2.0)), Some(Seq(1.0, 2.0, 2.0))),
      (2L, Some(Seq(0.0, 0.0, 0.0)), Some(Seq(1.0, 0.0, 0.0))),
      (3L, None, Some(Seq(1.0, 0.0, 0.0))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), cosine_similarity(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-12)
    assert(out(1).getDouble(1) == 0.0) // zero-norm guard, not NaN
    assert(out(2).isNullAt(1))         // null array => null result
  }

  test("mismatched-length arrays yield NULL, not a truncated similarity") {
    // Ragged/corrupt embeddings must not produce a confident wrong number
    // (matching the HOF semantics, where null-padded products null the sum).
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        cosine_similarity(col("a"), col("b")).as("c"),
        dot_product(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(math.abs(out(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - 5.0) < 1e-12)
  }

  test("codegen dot product matches the HOF formulation and Similarity.l2norm") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val hofDot = aggregate(
      zip_with(col("embedding").cast("array<double>"), col("embedding").cast("array<double>"),
        (p, q) => p * q),
      lit(0.0), (acc, v) => acc + v)
    val bad = emb.select(
        dot_product(col("embedding"), col("embedding")).as("fast"),
        hofDot.as("hof"),
        Similarity.l2norm(col("embedding")).as("nrm"))
      .filter(col("fast") =!= col("hof") || abs(sqrt(col("fast")) - col("nrm")) > 1e-12)
    assert(bad.count() == 0)
  }

  test("codegen cosine is orthogonal/antipodal-correct") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)))
      .toDF("a", "b")
    val vals = df.select(cosine_similarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(vals(0)) < 1e-12 && math.abs(vals(1) + 1.0) < 1e-12)
  }
}
