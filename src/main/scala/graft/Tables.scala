package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet star schema
  * (/root/testdata/sf*; see TESTDATA.md / FIXTURES.md §2).
  * All queries receive `sfDir` and resolve tables through here so the
  * read path (format, options) is defined in exactly one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** The events fixture has shipped with two physical `ts` encodings across
    * driver generations: parquet TIMESTAMP(NANOS) — which Spark can only
    * read as raw int64 via the legacy conf (PARQUET_TYPE_ILLEGAL otherwise)
    * — and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false, which reads
    * as TIMESTAMP_NTZ. Normalize both to session TimestampType so every
    * consumer is encoding-agnostic: nanos floor-divide to micros (the same
    * truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP), and NTZ
    * casts 1:1 under the fixed UTC session zone. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType (see [[events]]). */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
