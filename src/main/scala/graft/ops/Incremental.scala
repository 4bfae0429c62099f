package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.fs.{FeatureStore, FeatureTable}

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: a feature table holding ADDITIVE partial aggregates (counts,
  * sums — anything mergeable by +) is updated from each new data batch by
  * merging the batch's partials into the stored ones, instead of
  * recomputing the aggregate over all history.
  *
  * At 100 TB this is the difference between a refresh that touches one
  * day's partition and one that re-scans years: cost scales with the
  * DELTA, not the history. Averages/ratios derive at read time from the
  * stored sums; non-additive aggregates (exact distinct, percentiles)
  * need their mergeable-sketch forms instead ([[Sketches]] — HLL unions
  * the same way).
  *
  * Exactness: keep additive columns integral (longs, cents) or decimal —
  * then batch carving provably cannot change the result (integer addition
  * is associative and commutative; q93 hash-matches the full GROUP BY
  * after a 3-way split refresh). Double columns merge with float
  * rounding per refresh; the method works but drift is on the caller.
  */
object Incremental {

  /** Merge `delta` (fresh partial aggregates, keyed by the table's PK)
    * into feature table `name`: every non-PK column is summed null-as-
    * zero, untouched keys are not rewritten into the update set, and new
    * keys append. One left join of the (small) delta against the table —
    * Catalyst broadcasts the delta side — then a PK upsert of only the
    * touched keys. */
  def mergeAdditive(store: FeatureStore, name: String, delta: DataFrame): FeatureTable = {
    val ft = store.getTable(name)
    val pk = ft.primaryKeys
    val existing = store.readTable(name)
    require(delta.columns.sorted.sameElements(existing.columns.sorted),
      s"mergeAdditive($name): column mismatch — table has " +
        s"${existing.columns.sorted.mkString(",")}, delta has ${delta.columns.sorted.mkString(",")}")
    val nonPk = existing.columns.filterNot(pk.contains).toSeq
    nonPk.foreach { c =>
      require(existing.schema(c).dataType.isInstanceOf[NumericType],
        s"mergeAdditive($name): column $c is ${existing.schema(c).dataType.simpleString} — " +
          "additive maintenance needs numeric partials")
    }
    val touched = delta.as("d")
      .join(existing.as("e"), pk.map(k => col(s"d.$k") === col(s"e.$k")).reduce(_ && _), "left")
      .select(pk.map(k => col(s"d.$k").as(k)) ++ nonPk.map { c =>
        val dt = existing.schema(c).dataType
        (coalesce(col(s"d.$c"), lit(0)) + coalesce(col(s"e.$c"), lit(0)))
          .cast(dt).as(c)
      }: _*)
    store.upsert(name, touched)
  }
}
