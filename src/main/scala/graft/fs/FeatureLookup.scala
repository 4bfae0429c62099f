package graft.fs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** How the lookup's equi-join side should be planned.
  *
  * At 100 TB fact scale the feature side of a lookup is usually a bounded
  * dimension table → broadcast-hash join (no shuffle of the fact). When the
  * feature side is itself huge (e.g. a per-document feature table joined to a
  * per-document fact), broadcasting would OOM the executors — use Auto and
  * let Catalyst/AQE pick shuffle-hash vs sort-merge from runtime stats.
  */
sealed trait LookupHint
object LookupHint {
  /** Let Catalyst + AQE choose (respects autoBroadcastJoinThreshold). */
  case object Auto extends LookupHint
  /** Force broadcast of the feature side (bounded dimension). */
  case object Broadcast extends LookupHint
}

/** Declarative feature-lookup spec (reference: notebooks/02_model_training.py
  * :72-84, :176-180 — `FeatureLookup(table_name, feature_names, lookup_key)`).
  *
  * Semantics: "from `tableName`, bring columns `featureNames`, left-joining on
  * input.`lookupKey` == table.`tableKey`". `tableKey` defaults to `lookupKey`
  * (the reference's same-name contract); it may differ when the fact and
  * dimension use different key names (e.g. `o_custkey` vs `c_custkey`).
  *
  * `renames` optionally renames attached feature columns on the way out
  * (output aliasing, applied after projection).
  *
  * `timestampLookupKey` switches the lookup to POINT-IN-TIME mode (the
  * production feature-store `timestamp_lookup_key` contract): instead of a
  * plain equi-join, each fact row receives the latest feature row whose
  * `tableTimestampKey` (defaults to the same name) is ≤ the fact's
  * `timestampLookupKey` — resolved through [[graft.ops.AsOfJoin]], the
  * leakage-free join for time-versioned feature tables. In this mode the
  * feature table's key is (tableKey, tableTimestampKey) and PK uniqueness
  * applies to that pair.
  */
final case class FeatureLookup(
    tableName: String,
    featureNames: Seq[String],
    lookupKey: String,
    tableKeyOpt: Option[String] = None,
    hint: LookupHint = LookupHint.Auto,
    renames: Map[String, String] = Map.empty,
    timestampLookupKey: Option[String] = None,
    tableTimestampKey: Option[String] = None) {

  def tableKey: String = tableKeyOpt.getOrElse(lookupKey)

  /** Feature-side timestamp column in point-in-time mode. */
  def resolvedTableTimestampKey: Option[String] =
    timestampLookupKey.map(k => tableTimestampKey.getOrElse(k))

  /** Project the feature table to (key-as-lookupKey, features) and apply the
    * join hint. Projection first so only the needed columns cross the wire —
    * Catalyst prunes the parquet scan to exactly these columns.
    */
  def resolve(featureDf: DataFrame): DataFrame = {
    val projected = featureDf.select(
      (col(tableKey).as(lookupKey) +:
        featureNames.map(f => col(f).as(renames.getOrElse(f, f)))): _*)
    hint match {
      case LookupHint.Broadcast => broadcast(projected)
      case LookupHint.Auto      => projected
    }
  }

  /** Output column names this lookup attaches. */
  def outputColumns: Seq[String] = featureNames.map(f => renames.getOrElse(f, f))
}
