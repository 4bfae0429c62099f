package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parallelism hygiene for explode-heavy pipelines.
  *
  * A small parquet fixture arrives as ONE input split, which pins every
  * downstream map-side stage (shingling, token explodes, per-row vector
  * math) to a single task — the partial aggregation before the first
  * shuffle never parallelizes. Real 100 TB tables arrive as thousands of
  * splits and don't need this; the helper is a no-op there.
  */
object Partitioning {

  /** Round-robin the frame up to the session default parallelism when the
    * source has fewer splits; otherwise pass through untouched. The extra
    * shuffle moves only the raw (pre-explosion) rows — always the cheapest
    * place to buy parallelism for a heavy map stage. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Skew-defeating equi-join: a hot key on the probe side lands every one
    * of its rows in a single shuffle partition, pinning the join to one
    * straggler task no matter how many executors exist. Salting widens the
    * key: probe rows get a deterministic salt in [0, nSalts) derived from
    * `saltFrom` (their own payload — NOT `rand()`, so retried tasks and
    * reruns shuffle identically), the build side is replicated once per
    * salt value, and the join runs on (key, salt) — a hot key now spreads
    * over nSalts partitions at the cost of an nSalts× build-side blow-up.
    * Use when AQE's skew-join split (which handles most cases for free)
    * can't help: e.g. a skewed aggregation-input join feeding a single
    * partial aggregate. Semantics-preserving by construction — every
    * (probe row, build row) key match meets in exactly one salt bucket;
    * q60 proves it by hash-matching the unsalted oracle. */
  /** Two-level sliced prefix sum — the scale-safe replacement for a
    * running-total window whose partition key has low cardinality (or none
    * at all): `sum(weight) OVER (PARTITION BY groupCols ORDER BY valueCol,
    * tieBreak)` serializes each group through ONE task, so a 100 TB frame
    * with 5 groups (or a global ntile with zero) gets 5 tasks of
    * parallelism no matter the cluster size.
    *
    * Level 1: every row is assigned a contiguous `valueCol` slice whose
    * boundaries are computed ONCE on the driver (approxQuantile) and
    * embedded as literals — a pure function of the row, so the two plan
    * branches that both derive the slice (the local window and the offsets
    * aggregate) cannot disagree, unlike a spark_partition_id()-over-
    * repartitionByRange form whose correctness silently depends on
    * exchange reuse. The running sum inside each (slice, group) runs in a
    * window keyed by both, so serial chains are bounded by slice size and
    * parallelism scales with the DATA. Level 2: the per-(slice, group)
    * totals — at most #slices × #groups tiny rows — get their own
    * exclusive prefix over slice order and come back BROADCAST as
    * starting offsets; a map-side add finishes the global sum.
    *
    * Ties at a slice boundary land in one slice (strict `<` against the
    * literal bounds), so slice order composed with within-slice order is
    * exactly the global (valueCol, tieBreak) order whenever that order is
    * total. Returns `df` plus `outCol` (the inclusive running sum) and,
    * when `totalCol` is set, the group's grand total on every row (for
    * callers that need global-index arithmetic, e.g. exact ntile).
    * Shared by [[graft.ops.Curation]]'s token prefix sums and
    * [[graft.ops.Relational.ntileAssign]] — one implementation of the
    * subtle part, two very different operators on top. */
  def slicedPrefix(df: DataFrame, valueCol: String, tieBreak: Seq[String],
      groupCols: Seq[String], weight: Column, outCol: String,
      totalCol: Option[String] = None): DataFrame = {
    require(!df.columns.contains("__slice"),
      "slicedPrefix reserves the __slice column name; rename the input column")
    val slices = df.sparkSession.sessionState.conf.numShufflePartitions
    val probes = (1 until slices).map(_.toDouble / slices).toArray
    // Bounded driver state: at most slices-1 boundary values, one
    // pushed-down pass over valueCol; output lands in the plan as
    // literals, never as a recomputed subtree.
    val bounds = df.stat.approxQuantile(valueCol, probes, 0.001).distinct.sorted
    val sliceCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(
        array(bounds.map(b => lit(b)): _*),
        b => b < col(valueCol).cast("double")))
    val sliced = df.withColumn("__slice", sliceCol)
    val order = (col(valueCol) +: tieBreak.map(col)).map(_.asc)
    val wLocal = Window
      .partitionBy(col("__slice") +: groupCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sliced.withColumn("__local", sum(weight).over(wLocal))
    // Tiny frame from here down: one row per (slice, group). Its windows
    // are keyed by the group alone (or nothing), which is fine at
    // #slices × #groups rows — PlanSpec checks the full-data window is
    // the (slice, group) one.
    val wOffset = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = local
      .groupBy(col("__slice") +: groupCols.map(col): _*)
      .agg(sum(weight).as("__slice_total"))
      .withColumn("__offset", coalesce(sum(col("__slice_total")).over(wOffset), lit(0L)))
    val withTotal = totalCol.fold(totals) { t =>
      val wAll = Window.partitionBy(groupCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      totals.withColumn(t, sum(col("__slice_total")).over(wAll))
    }
    val offsets = withTotal.select(
      (col("__slice") +: groupCols.map(col)) ++
        (col("__offset") +: totalCol.map(col).toSeq): _*)
    local.join(broadcast(offsets), "__slice" +: groupCols)
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__slice", "__local", "__offset")
  }

  /** Two-level sliced running MAX — [[slicedPrefix]]'s sibling for prefix
    * extrema: annotates each row with the max of `maxOf` over all rows
    * BEFORE it in (`valueCol`, tieBreak) order (`strictCol`, null on the
    * global first row) and over rows up to and including it (`leqCol`).
    * Same machinery as the prefix sum: driver-literal quantile slices,
    * a per-slice rows-frame window, and a broadcast prefix of per-slice
    * maxima — never a global single-partition window over the data.
    *
    * The strict column uses a rows frame, so it is a strict PREFIX max in
    * row order; it is a strict VALUE max (max over `valueCol` strictly
    * less) exactly when `valueCol` is unique per row — which is how
    * [[graft.ops.Relational.paretoFrontier]] calls it (one row per
    * distinct price). Callers with duplicate values get row-order
    * semantics, as any window would give. */
  def slicedRunningMax(df: DataFrame, valueCol: String, tieBreak: Seq[String],
      maxOf: Column, strictCol: String, leqCol: String): DataFrame = {
    require(!df.columns.contains("__slice") && !df.columns.contains("__v"),
      "slicedRunningMax reserves __slice/__v; rename the input column")
    val slices = df.sparkSession.sessionState.conf.numShufflePartitions
    val probes = (1 until slices).map(_.toDouble / slices).toArray
    val bounds = df.stat.approxQuantile(valueCol, probes, 0.001).distinct.sorted
    val sliceCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(
        array(bounds.map(b => lit(b)): _*),
        b => b < col(valueCol).cast("double")))
    val sliced = df.withColumn("__slice", sliceCol).withColumn("__v", maxOf)
    val order = (col(valueCol) +: tieBreak.map(col)).map(_.asc)
    val base = Window.partitionBy(col("__slice")).orderBy(order: _*)
    val local = sliced
      .withColumn("__leq_l", max(col("__v")).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__str_l", max(col("__v")).over(
        base.rowsBetween(Window.unboundedPreceding, -1)))
    // One row per slice; the exclusive prefix over slice order is tiny and
    // comes back broadcast, exactly as in slicedPrefix.
    val offs = local.groupBy(col("__slice")).agg(max(col("__v")).as("__smax"))
      .withColumn("__off", max(col("__smax")).over(
        Window.orderBy(col("__slice")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__slice"), col("__off"))
    // greatest() ignores nulls (null only when ALL inputs are null), which
    // is exactly the identity-element behavior a prefix max needs.
    local.join(broadcast(offs), Seq("__slice"))
      .withColumn(strictCol, greatest(col("__off"), col("__str_l")))
      .withColumn(leqCol, greatest(col("__off"), col("__leq_l")))
      .drop("__slice", "__v", "__leq_l", "__str_l", "__off")
  }

  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFrom: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"need nSalts >= 1, got $nSalts")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "saltedEquiJoin reserves the __salt column name; rename the input column")
    val salted = probe.withColumn("__salt", pmod(xxhash64(saltFrom), lit(nSalts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
