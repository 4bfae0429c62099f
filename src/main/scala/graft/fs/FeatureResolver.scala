package graft.fs

import org.apache.spark.sql.DataFrame

/** Anything that can resolve a feature table by name — the surface
  * [[TrainingSet]] and batch scoring need. Implemented by the path-backed
  * [[FeatureStore]] and the catalog-backed [[CatalogFeatureStore]], so
  * training-set assembly is storage-agnostic (the reference resolves names
  * through the Databricks FS catalog the same way,
  * notebooks/02_model_training.py:140-148).
  */
trait FeatureResolver {
  def readTable(name: String): DataFrame
}
