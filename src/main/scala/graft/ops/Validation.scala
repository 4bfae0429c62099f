package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality predicates over DataFrames (reference P5:
  * notebooks/02_model_training.py:340 — `isnull().any().any()` gating the
  * missing-value warning). Both operations are single distributed
  * aggregations — one pass over the data regardless of column count, no
  * driver-side iteration.
  */
object Validation {

  /** True iff any of `cols` holds a null anywhere — the distributed
    * equivalent of pandas' `isnull().any().any()`. One agg job producing a
    * single row (a `max` per column), never a collect of data rows. */
  def anyNull(df: DataFrame, cols: Seq[String]): Boolean = {
    require(cols.nonEmpty, "anyNull needs at least one column")
    val flags = cols.map(c => max(col(c).isNull.cast("int")).as(c))
    val row = df.agg(flags.head, flags.tail: _*).head()
    cols.indices.exists(i => !row.isNullAt(i) && row.getInt(i) > 0)
  }

  /** Per-column null audit: (column_name, n_nulls, n_rows). Computed as one
    * aggregation row (a conditional count per column plus the total) then
    * unpivoted — so the cost is one scan, not one job per column. */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullAudit needs at least one column")
    val aggs = cols.map(c => sum(col(c).isNull.cast("long")).as(c)) :+
      count(lit(1)).as("__n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array(col("__n_rows")), cols.map(col).toArray, "column_name", "n_nulls")
      .select(col("column_name"), col("n_nulls"), col("__n_rows").as("n_rows"))
      .orderBy("column_name")
  }

  /** One-pass table profile: per column — nulls, distinct count, and
    * min/max rendered as strings (so heterogeneous column types unpivot
    * into one result shape). The distributed `DESCRIBE` of table
    * management: everything folds into ONE aggregation over one scan (the
    * per-column aggregates all ride the same job), then a constant-size
    * unpivot.
    *
    * `exactDistinct = true` (q66 — oracle-checkable) plans N parallel
    * `countDistinct`s, which Spark executes through an Expand: the input is
    * replicated once per distinct aggregate and shuffled — N+1× the table
    * through the exchange. Fine at dimension-table scale; at 100 TB wide-
    * table scale pass `false` to profile with `approx_count_distinct`
    * (mergeable HLL sketches, see [[Sketches]]): NO Expand, no row
    * replication, map-side partial aggregation, one sketch per column of
    * state — the same shape as every other aggregate in the job. */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such columns: ${missing.mkString(", ")}")
    // min/max carry string (and other non-primitive) aggregation buffers,
    // which Spark's HashAggregate cannot hold — so any aggregation mixing
    // them with exact countDistinct rides the distinct rewrite's Expand
    // and degrades to SortAggregate: the (N+1)x-expanded table gets SORTED
    // by every profiled column (measured 3.5 s of q66's 3.5 s at sf0.1).
    // Split the exact path instead: the N countDistincts run alone (pure
    // group-by keys through the Expand — HashAggregate all the way), and
    // nulls/min/max/count fold in ONE keyless pass (no sort: a global
    // SortAggregate with empty keys is just a fold). Two scans beat one
    // scan + a full sort of (N+1)x the table at every scale.
    val basicAggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n_rows")
    val one =
      if (exactDistinct) {
        val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"__distinct_$c"))
        df.agg(basicAggs.head, basicAggs.tail: _*)
          .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
      } else {
        // approx_count_distinct's HLL buffer is binary (non-hashable too),
        // but with no Expand in play the whole profile stays ONE keyless
        // fold pass — keep the single-scan shape.
        val aggs = cols.flatMap { c =>
          Seq(
            sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
            approx_count_distinct(col(c), rsd).as(s"__distinct_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
        } :+ count(lit(1)).as("__n_rows")
        df.agg(aggs.head, aggs.tail: _*)
      }
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one
      .select(col("__n_rows").as("n_rows"), explode(array(perCol: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_value"), col("p.max_value"), col("n_rows"))
      .orderBy("column_name")
  }

  /** Population-stability-index drift per bin — the standard
    * feature-monitoring readout between a reference window and the current
    * one (a model whose inputs drift is a model to retrain; the reference's
    * registry workflow implies exactly this check over time). Rows split
    * by `isRef` (reference vs current) are bucketed into `nBins`
    * fixed-width bins over `column` (outliers clamp into the edge bins);
    * each bin reports its counts, its probability mass on both sides, and
    * its PSI contribution `(p_ref − p_cur)·ln(p_ref / p_cur)` — summing
    * `psi_term` gives the scalar PSI (<0.1 stable, >0.25 drifted by the
    * usual rule of thumb). Bins empty on either side contribute 0 (the
    * standard skip treatment, stated rather than epsilon-fudged).
    *
    * ONE scan: both splits bucket and count in a single conditional
    * aggregation (no per-split jobs), and the totals window runs over the
    * nBins-row aggregate, not the data. */
  def psiDrift(df: DataFrame, isRef: Column, column: String,
      binWidth: Double, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 0, "need binWidth > 0 and nBins > 0")
    val bin = least(greatest(floor(col(column) / binWidth), lit(0)),
      lit(nBins - 1)).cast("int")
    val counts = df
      .select(bin.as("bin"), isRef.as("__ref"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("__ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(coalesce(col("__ref"), lit(false)), 0L).otherwise(1L)).as("n_cur"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    counts
      .withColumn("__tr", sum(col("n_ref")).over(whole))
      .withColumn("__tc", sum(col("n_cur")).over(whole))
      .withColumn("p_ref", col("n_ref") / col("__tr"))
      .withColumn("p_cur", col("n_cur") / col("__tc"))
      .select(
        col("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 6))
          .otherwise(0.0).as("psi_term"))
      .orderBy("bin")
  }

  /** A named row-level data-quality rule: a row VIOLATES the expectation
    * when `predicate` evaluates to false or NULL (three-valued logic is
    * resolved pessimistically — an unknown is a violation, so
    * `col("x") > 0` catches null x without spelling out the null check). */
  final case class Expectation(name: String, predicate: Column)

  /** Declarative expectation suite over a frame — the create_table-time
    * contract check of feature-store ingestion (the executable form of the
    * reference's scattered pre-flight guards: non-empty, PK present,
    * notebooks/01_feature_table_creation.py:142-174). Returns one row per
    * expectation: (check_name, n_rows, n_violations, passed).
    *
    * All expectations fold into ONE aggregation over one scan (a
    * conditional count per rule riding a single agg job, like [[profile]]),
    * then a constant-size unpivot — cost is one pass regardless of how many
    * rules are declared, no driver-side row iteration, so the suite runs at
    * full-corpus scale as cheaply as a count(*). */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = rules.map(r =>
      sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L)).as(r.name)) :+
      count(lit(1)).as("__n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array(col("__n_rows")), rules.map(r => col(r.name)).toArray,
        "check_name", "n_violations")
      .select(col("check_name"), col("__n_rows").as("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
      .orderBy("check_name")
  }
}
