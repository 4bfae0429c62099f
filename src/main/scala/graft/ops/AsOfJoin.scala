package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) feature join — the feature-store operator behind
  * time-versioned lookups (the production Databricks Feature Store exposes
  * it as `timestamp_lookup_key`; the reference notebooks use only the
  * untimed variant): for every fact row, attach the LATEST feature row of
  * the same key whose timestamp is ≤ the fact's timestamp. Left semantics —
  * facts with no prior feature keep NULL features. This is what makes
  * training sets leakage-free: a model may only see feature values that
  * existed when the label event happened.
  *
  * Spark has no asof-join operator; the classic range-join formulation
  * (`a.key = b.key AND b.ts <= a.ts`, then keep the max) explodes into a
  * per-key cartesian before pruning. This implementation instead composes
  * existing operators — the union + running-`last` window trick:
  *
  *   1. union facts (tagged 0) and features (tagged 1) on (key, ts);
  *   2. one window per key ordered by (ts, tag DESC) — the feature row
  *      sorts BEFORE any fact at the same timestamp, making the join
  *      inclusive (ts_feature = ts_fact applies);
  *   3. running `last(feature-version-struct, ignoreNulls)` over rows
  *      unbounded-preceding → every fact row sees exactly the most recent
  *      feature VERSION (all columns from the same version, NULL values
  *      attached as-is — see the struct note in [[asOf]]);
  *   4. keep the fact rows.
  *
  * Cost: ONE shuffle of |facts| + |features| rows keyed by the join key —
  * no range explosion, no per-key quadratic blowup, skew bounded by the
  * hottest key's row count (salt upstream if one key dominates). This is
  * the standard scale-safe as-of plan at 100 TB.
  *
  * Contract: `features` should be unique per (keys, featureTime) — dedupe
  * upstream (e.g. groupBy(keys, ts).agg(max ...)) or ties at identical
  * timestamps resolve arbitrarily.
  */
object AsOfJoin {

  def asOf(
      facts: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      factTime: String,
      featureTime: String,
      featureCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asOf: need at least one join key")
    val missingF = (keys :+ factTime).filterNot(facts.columns.contains)
    require(missingF.isEmpty, s"asOf: fact columns missing: ${missingF.mkString(", ")}")
    val missingT = (keys ++ (featureTime +: featureCols)).filterNot(features.columns.contains)
    require(missingT.isEmpty, s"asOf: feature columns missing: ${missingT.mkString(", ")}")

    val factPayload = facts.columns.toSeq.filterNot(keys.contains)
    // The whole feature version travels as ONE struct, and the running
    // `last` picks the struct, not each column independently. This is what
    // gives real as-of semantics: a version whose value is NULL is still
    // the version that applies (its NULL must be attached, not backfilled
    // from an older version), and multiple feature columns always come
    // from the SAME version — never a column-wise mix of versions.
    val featStructType = org.apache.spark.sql.types.StructType(
      featureCols.map(c => org.apache.spark.sql.types.StructField(
        c, features.schema(c).dataType, nullable = true)))

    val taggedFacts = facts.select(
      (keys.map(col) ++
        Seq(col(factTime).as("__ts"), lit(0).as("__isFeat"),
          lit(null).cast(featStructType).as("__feat")) ++
        factPayload.map(col)): _*)
    val taggedFeats = features
      // A NULL-timestamp version can never satisfy ts_feature <= ts_fact
      // (matches SQL ASOF, where the comparison with NULL is false) — it
      // must not sort nulls-first and apply "since forever".
      .filter(col(featureTime).isNotNull)
      .select(
        (keys.map(col) ++
          Seq(col(featureTime).as("__ts"), lit(1).as("__isFeat"),
            struct(featureCols.map(col): _*).as("__feat")) ++
          factPayload.map(c => lit(null).cast(facts.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isFeat").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached: Seq[Column] = featureCols.map(c => col("__last_feat").getField(c).as(c))

    taggedFacts.unionByName(taggedFeats)
      .withColumn("__last_feat", last(col("__feat"), ignoreNulls = true).over(w))
      .filter(col("__isFeat") === 0)
      .select((keys.map(col) ++ factPayload.map(col) ++ attached): _*)
  }
}
