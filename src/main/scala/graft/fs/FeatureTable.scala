package graft.fs

import org.apache.spark.sql.types.StructType

/** Metadata for a registered feature table: a named, described, primary-keyed
  * relational table (reference: notebooks/01_feature_table_creation.py:56-67,
  * 177-183 — `fs_client.create_table(name, primary_keys, df, schema,
  * description)`).
  *
  * PK uniqueness is the lookup contract: each key tuple resolves to exactly
  * one feature row, so feature lookups (left equi-joins) never multiply fact
  * rows. OSS Spark has no PK constraint; [[FeatureStore.createTable]] enforces
  * uniqueness with a distributed group-by check at write time.
  */
final case class FeatureTable(
    name: String,
    primaryKeys: Seq[String],
    description: String,
    schema: StructType,
    path: String,
    partitionColumns: Seq[String] = Nil)
