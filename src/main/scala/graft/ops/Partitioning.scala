package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
