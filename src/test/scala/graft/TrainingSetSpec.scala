package graft

import org.apache.spark.sql.functions.col

import graft.fs.{FeatureLookup, LookupHint, TrainingSet}
import graft.ingest.CsvIngest

/** Training-set assembly semantics against the reference's own CSVs
  * (SURVEY.md §5 item 4: the e2e fixture contract — 500 rows ×
  * [on_sales, total_purchase_7d, total_purchase_30d, category, purchased]).
  */
class TrainingSetSpec extends SparkSpec {

  private lazy val labels = CsvIngest.readInferred(spark, refData("training_labels.csv"))
  private lazy val custFeat = CsvIngest.readInferred(spark, refData("customer_features.csv"))
  private lazy val prodFeat = CsvIngest.readInferred(spark, refData("product_features.csv"))

  private def referenceTrainingSet: TrainingSet =
    TrainingSet.fromFrames(
      labels,
      Seq(
        FeatureLookup("customer_features", Seq("total_purchase_7d", "total_purchase_30d"),
          "customer_id", hint = LookupHint.Broadcast) -> custFeat,
        FeatureLookup("product_features", Seq("category"),
          "product_id", hint = LookupHint.Broadcast) -> prodFeat),
      labelColumn = Some("purchased"),
      excludeColumns = Seq("customer_id", "product_id"))

  test("reference shape: 500 rows x expected columns, keys excluded") {
    val df = referenceTrainingSet.loadDf
    assert(df.count() == 500)
    assert(df.columns.toSet ==
      Set("on_sales", "total_purchase_7d", "total_purchase_30d", "category", "purchased"))
  }

  test("lookups never multiply fact rows (PK-unique feature side)") {
    assert(referenceTrainingSet.loadDf.count() == labels.count())
  }

  test("duplicate label keys are preserved (19 dup pairs — N:1, not 1:1)") {
    val dupPairs = labels.groupBy("customer_id", "product_id").count()
      .filter(col("count") > 1).count()
    assert(dupPairs == 19)
    assert(referenceTrainingSet.loadDf.count() == 500)
  }

  test("left-join semantics: unmatched keys survive with null features") {
    import spark.implicits._
    val orphanLabels = Seq((9999, 1, 0, 1)).toDF("customer_id", "product_id", "on_sales", "purchased")
    val ts = TrainingSet.fromFrames(
      orphanLabels,
      Seq(FeatureLookup("customer_features", Seq("total_purchase_7d"), "customer_id") -> custFeat),
      excludeColumns = Seq("customer_id"))
    val row = ts.loadDf.collect().head
    assert(row.getAs[Any]("total_purchase_7d") == null)
  }

  test("no feature-cell nulls in the reference assembly (all FKs resolve)") {
    val df = referenceTrainingSet.loadDf
    val nullCount = df.filter(
      col("total_purchase_7d").isNull || col("total_purchase_30d").isNull || col("category").isNull
    ).count()
    assert(nullCount == 0)
  }

  test("time-versioned lookup resolves point-in-time feature values") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val facts = Seq(
      (1L, 10L, t("2024-03-01 00:00:00"), 1),
      (2L, 10L, t("2024-03-15 00:00:00"), 0),
      (3L, 10L, t("2024-02-01 00:00:00"), 1))  // before first feature version
      .toDF("fact_id", "customer_id", "ts", "purchased")
    // Two feature versions for customer 10: March facts must see the value
    // that existed at their own timestamp, never the later one.
    val versioned = Seq(
      (10L, t("2024-02-15 00:00:00"), 100.0),
      (10L, t("2024-03-10 00:00:00"), 200.0))
      .toDF("customer_id", "feature_ts", "spend")
    val ts730 = TrainingSet.fromFrames(
      facts,
      Seq(FeatureLookup("spend_history", Seq("spend"), "customer_id",
        timestampLookupKey = Some("ts"),
        tableTimestampKey = Some("feature_ts")) -> versioned),
      labelColumn = Some("purchased"),
      excludeColumns = Seq("customer_id"))
    val got = ts730.loadDf.collect()
      .map(r => r.getAs[Long]("fact_id") -> Option(r.get(r.fieldIndex("spend")))).toMap
    assert(got == Map(1L -> Some(100.0), 2L -> Some(200.0), 3L -> None))
    assert(ts730.loadDf.columns.toSet == Set("fact_id", "ts", "purchased", "spend"))
  }

  test("lookup with differing key names (tableKey mapping)") {
    val facts = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val ts = TrainingSet.fromFrames(
      facts,
      Seq(FeatureLookup("customer", Seq("c_mktsegment"), "o_custkey",
        Some("c_custkey"), LookupHint.Broadcast) -> Tables.customer(spark, sf)),
      excludeColumns = Seq("o_custkey"))
    val df = ts.loadDf
    assert(df.columns.toSet == Set("o_orderkey", "o_totalprice", "c_mktsegment"))
    assert(df.count() == facts.count())
  }
}
