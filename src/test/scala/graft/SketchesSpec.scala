package graft

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {

  test("hll estimates sit within 5% of exact distinct counts; union row rolls up") {
    val out = Sketches.tokenDistinctSketch(Tables.documents(spark, sf)).collect()
    assert(out.nonEmpty)
    val all = out.filter(_.getString(0) == "__ALL__")
    assert(all.length == 1, "exactly one union row")
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val est = r.getAs[Long]("hll_estimate")
      assert(exact > 0)
      val relErr = math.abs(est - exact).toDouble / exact
      // lgConfigK=12 => HLL standard error ~1.6%; 5% is a safe determinism
      // bound (the sketch is a pure function of the value set).
      assert(relErr < 0.05, s"source ${r.getString(0)}: est $est vs exact $exact")
    }
    // The union estimate must be at least the largest per-source estimate.
    val perSourceMax = out.filterNot(_.getString(0) == "__ALL__")
      .map(_.getAs[Long]("hll_estimate")).max
    assert(all.head.getAs[Long]("hll_estimate") >= perSourceMax)
  }

  test("q102: approx grouped percentiles stay within 1% of exact") {
    // The q51 scale path measured, not assumed: at accuracy=10000 the
    // approx_percentile sketch's rank error is 1/10000, which on this
    // distribution must keep the VALUE within 1% relative error of exact
    // (the query reports the observed error per group; a distribution
    // change that breaks the bound fails here).
    val out = SparkEntry.queries("q102_percentile_approx")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val flag = r.getString(0)
      Seq("p50_rel_err", "p95_rel_err").foreach { c =>
        val err = r.getAs[Double](c)
        assert(err <= 0.01, s"group $flag: $c = $err exceeds 1%")
      }
    }
  }
}
