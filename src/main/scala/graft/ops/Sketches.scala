package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB path for distinct
  * counting: HyperLogLog sketches (Apache DataSketches HLL, built into
  * Spark) are fixed-size and MERGEABLE, so per-partition partial sketches
  * combine associatively and per-group sketches can be persisted and
  * unioned later without touching the raw data again — the property exact
  * `COUNT(DISTINCT)` fundamentally lacks (its state is the value set
  * itself). No DuckDB oracle: estimates are implementation-specific;
  * SketchesSpec bounds the relative error against the exact count instead.
  */
object Sketches {

  /** Distinct-token accounting per source, exact vs sketch, plus a corpus
    * total computed two independent ways: an exact global distinct and a
    * UNION of the per-source sketches (`hll_union_agg`) — demonstrating the
    * re-aggregation that makes sketches composable (per-day/per-source
    * sketches roll up to any coarser grain for free). The exact columns
    * exist to expose estimation error; a production 100 TB run would drop
    * them and keep only the sketch path. */
  def tokenDistinctSketch(documents: DataFrame, lgConfigK: Int = 12): DataFrame = {
    val toks = Partitioning.spread(documents)
      .select(col("source"), explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
    val perSource = toks
      .groupBy(col("source"))
      .agg(
        countDistinct(col("tok")).as("exact_distinct"),
        hll_sketch_agg(col("tok"), lit(lgConfigK)).as("__sketch"))
      .withColumn("hll_estimate", hll_sketch_estimate(col("__sketch")))
    val overallExact = toks.agg(countDistinct(col("tok")).as("exact_distinct"))
    val overall = perSource
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"), lit(false))).as("hll_estimate"))
      .crossJoin(overallExact)
      .select(lit("__ALL__").as("source"), col("exact_distinct"), col("hll_estimate"))
    perSource
      .select(col("source"), col("exact_distinct"), col("hll_estimate"))
      .union(overall)
      .orderBy("source")
  }
}
