package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion with the reference's options (header + inferred schema;
  * notebooks/01_feature_table_creation.py:70-75,136-151) plus a
  * production fast path that takes an explicit schema — schema inference
  * costs an extra full pass over the file, which at 100 TB is a non-starter
  * (SURVEY.md §4 anti-patterns).
  */
object CsvIngest {

  /** Reference-parity read: header=true, inferSchema=true, sep=",". */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", ",")
      .csv(path)

  /** Production read: explicit schema, single pass, malformed rows fail fast. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", ",")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** Non-empty validation (reference: 01_feature_table_creation.py:142-143).
    * Uses limit(1) instead of the reference's full count() — O(first row),
    * not O(table). */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    require(!df.isEmpty, s"$what: no data rows")
    df
  }

  /** Column-presence validation (reference: 01:172-174, 02:220-221). */
  def requireColumns(df: DataFrame, cols: Seq[String], what: String): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$what: missing columns ${missing.mkString(", ")}")
    df
  }
}
