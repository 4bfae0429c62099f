package graft.ml

import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

/** Classification metrics over a scored DataFrame — the reference's
  * `calculate_metrics` (notebooks/02_model_training.py:367-387: accuracy,
  * weighted precision/recall/F1, ROC-AUC) plus the confusion matrix
  * (:458-459), all as Spark aggregations — no driver-side materialization
  * of predictions.
  */
object Metrics {

  final case class ClassificationMetrics(
      accuracy: Double,
      weightedPrecision: Double,
      weightedRecall: Double,
      weightedF1: Double,
      areaUnderROC: Double)

  def evaluate(scored: DataFrame, labelColumn: String): ClassificationMetrics = {
    val withLabel = scored.withColumn("__label", col(labelColumn).cast("double"))
    def multi(metric: String): Double =
      new MulticlassClassificationEvaluator()
        .setLabelCol("__label").setPredictionCol("prediction").setMetricName(metric)
        .evaluate(withLabel)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("__label").setRawPredictionCol("probability").setMetricName("areaUnderROC")
      .evaluate(withLabel)
    ClassificationMetrics(
      accuracy = multi("accuracy"),
      weightedPrecision = multi("weightedPrecision"),
      weightedRecall = multi("weightedRecall"),
      weightedF1 = multi("f1"),
      areaUnderROC = auc)
  }

  /** Confusion matrix as a (label, prediction, n) DataFrame (reference A3). */
  def confusionMatrix(scored: DataFrame, labelColumn: String): DataFrame =
    scored
      .groupBy(col(labelColumn).cast("double").as("label"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")
}
