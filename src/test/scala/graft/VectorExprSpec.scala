package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_similarity
import graft.sim.Similarity

class VectorExprSpec extends SparkSpec {

  import spark.implicits._

  test("codegen cosine matches the higher-order-function formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      cosine_similarity(col("embedding"), col("qe")).as("fast"),
      (Similarity.dot(col("embedding"), col("qe")) /
        (Similarity.l2norm(col("embedding")) * Similarity.l2norm(col("qe")))).as("hof"))
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

  test("codegen cosine is orthogonal/antipodal-correct") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)))
      .toDF("a", "b")
    val vals = df.select(cosine_similarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(vals(0)) < 1e-12 && math.abs(vals(1) + 1.0) < 1e-12)
  }
}
