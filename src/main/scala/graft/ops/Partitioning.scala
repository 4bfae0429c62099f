package graft.ops

import org.apache.spark.sql.DataFrame

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
}
