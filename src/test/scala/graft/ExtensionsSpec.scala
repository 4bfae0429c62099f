package graft

import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, DotProduct, L2Normalize}
import graft.functions.VectorFunctions.{cosine_similarity, l2_normalize}

/** GraftExtensions wiring (spark.sql.extensions=graft.GraftExtensions —
  * set on the shared test session by SparkSpec, exactly as Verify/Bench
  * set it) plus the L2Normalize expression and the NormalizedCosineToDot
  * optimizer rule it injects. */
class ExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("injected SQL functions resolve in a fresh session with no register() call") {
    // newSession() builds a fresh SessionState: parent temp-function
    // registrations do NOT carry over, so resolution here can only come
    // from the extension's injectFunction descriptors.
    val fresh = spark.newSession()
    val row = fresh.sql(
      """SELECT graft_cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2_normalize(array(3.0D, 4.0D)) AS n""".stripMargin).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
    assert(row.getSeq[Double](2) == Seq(0.6, 0.8))
  }

  test("l2_normalize: unit norm, zero vector fixed point, float widening, null passthrough") {
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, None))
      .toDF("id", "v")
      .select(col("id"), l2_normalize(col("v")).as("n"))
      .orderBy("id").collect()
    assert(math.abs(df(0).getSeq[Double](1).map(x => x * x).sum - 1.0) < 1e-12)
    assert(df(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(df(1).getSeq[Double](1) == Seq(0.0, 0.0)) // no direction -> itself
    assert(df(2).isNullAt(1))
  }

  private def optimizedExprs(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.optimizedPlan
    // expressions of EVERY node — plan.expressions alone reads only the root
    plan.collect { case node => node.expressions }.flatten.flatMap(_.collect {
      case c: CosineSimilarity => c: Any
      case d: DotProduct => d: Any
    })
  }

  test("optimizer rule rewrites cosine-over-normalized to dot product") {
    // Parquet-backed input: a local Seq would be constant-folded into a
    // LocalRelation by ConvertToLocalRelation, leaving no expression to
    // inspect (exactly what happens to literal-only plans in production).
    val emb = Tables.embeddings(spark, sf).limit(2)
    val df = emb.select(
      cosine_similarity(l2_normalize(col("embedding")), l2_normalize(col("embedding"))).as("c"))
    val exprs = optimizedExprs(df)
    assert(exprs.exists(_.isInstanceOf[DotProduct]),
      s"expected DotProduct in optimized plan, got: ${df.queryExecution.optimizedPlan}")
    assert(!exprs.exists(_.isInstanceOf[CosineSimilarity]),
      "CosineSimilarity should have been strength-reduced away")
  }

  test("optimizer rule leaves raw (un-normalized) cosine untouched") {
    val emb = Tables.embeddings(spark, sf).limit(2)
    val df = emb.select(cosine_similarity(col("embedding"), col("embedding")).as("c"))
    val exprs = optimizedExprs(df)
    assert(exprs.exists(_.isInstanceOf[CosineSimilarity]),
      s"plan: ${df.queryExecution.optimizedPlan}")
    assert(!exprs.exists(_.isInstanceOf[DotProduct]))
  }

  test("rewritten form agrees with unrewritten cosine to 1e-12 on real embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q)).select(
      col("vec_id"),
      cosine_similarity(l2_normalize(col("embedding")), l2_normalize(col("qe")))
        .as("rewritten"),
      cosine_similarity(col("embedding"), col("qe")).as("raw"))
    // The rewrite skips dividing by norms that are 1 +- 1 ulp, so results
    // agree to ~1e-15 relative error, not bit-for-bit (documented on the
    // rule). 1e-12 leaves lots of headroom while still catching any
    // semantic regression.
    val maxDiff = both.select(max(abs(col("rewritten") - col("raw")))).head().getDouble(0)
    assert(maxDiff < 1e-12, s"rewrite drifted by $maxDiff")
  }

  test("rewrite preserves the zero-vector and mismatched-length edge cases") {
    val df = Seq(
      (1L, Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),   // zero vector -> 0.0
      (2L, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // ragged -> NULL
      (3L, None, Some(Seq(1.0, 2.0))))                  // null -> NULL
      .toDF("id", "a", "b")
      .select(col("id"),
        cosine_similarity(l2_normalize(col("a")), l2_normalize(col("b"))).as("c"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 0.0)
    assert(df(1).isNullAt(1))
    assert(df(2).isNullAt(1))
  }

  test("L2Normalize + NormalizedCosineToDot stay codegen'd: fallbacks fail loudly") {
    // Two layers of silent degradation exist: whole-stage codegen can fall
    // back to per-operator execution (spark.sql.codegen.fallback), and each
    // projection can fall back to interpreted mode
    // (spark.sql.codegen.factoryMode). Round 3 shipped a Janino-invalid
    // qualifier in L2Normalize.doGenCode that only ever surfaced as a WARN;
    // pin both escape hatches shut so that class of bug is a test failure.
    val overrides = Seq(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false")
    val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val emb = Tables.embeddings(spark, sf).limit(10)
      // Bare l2_normalize projection (exercises doGenCode directly).
      val norms = emb.select(l2_normalize(col("embedding")).as("n")).collect()
      assert(norms.nonEmpty && norms.forall { r =>
        math.abs(r.getSeq[Double](0).map(x => x * x).sum - 1.0) < 1e-9
      })
      // The rewritten DotProduct(L2Normalize, L2Normalize) hot path.
      val sims = emb.select(
        cosine_similarity(l2_normalize(col("embedding")), l2_normalize(col("embedding"))).as("c"))
        .collect()
      assert(sims.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("SQL query through a fresh session gets the rule too") {
    val fresh = spark.newSession()
    Tables.embeddings(fresh, sf).limit(50).createOrReplaceTempView("ext_emb")
    val df = fresh.sql(
      """SELECT vec_id,
        |  graft_cosine_similarity(graft_l2_normalize(embedding),
        |    graft_l2_normalize(embedding)) AS self_sim
        |FROM ext_emb""".stripMargin)
    val exprs = optimizedExprs(df.toDF())
    assert(exprs.exists(_.isInstanceOf[DotProduct]) &&
      !exprs.exists(_.isInstanceOf[CosineSimilarity]),
      s"extension-injected rule should fire on SQL plans in a fresh session; " +
        s"plan: ${df.queryExecution.optimizedPlan}")
    // Self-similarity of a unit vector == its squared norm == 1 (+- ulp).
    val vals = df.collect().map(_.getDouble(1))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }
}
