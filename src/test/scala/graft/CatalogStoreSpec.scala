package graft


import org.apache.spark.sql.functions.col

import graft.fs.{CatalogFeatureStore, FeatureLookup, LookupHint, PrimaryKeyViolation, TrainingSet}
import graft.ingest.{CsvIngest, SourceValidation}
import graft.ops.Validation

/** Catalog-backed store (S6), source-directory validation (S5), and the
  * null/histogram data-quality ops (P5/A2). */
class CatalogStoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val warehouse = tempDir("graft_wh")
  private lazy val store =
    new CatalogFeatureStore(spark, "graft_test_db", Some(s"$warehouse/graft_test_db.db"))

  test("catalog createTable registers a named table readable via spark.table") {
    val df = CsvIngest.readInferred(spark, refData("customer_features.csv"))
    store.createTable("customer_features", Seq("customer_id"), df, "Customer features")
    // The contract the reference's users rely on: resolve by name through
    // the session catalog, not through a path.
    val byName = spark.table("graft_test_db.customer_features")
    assert(byName.count() == 100)
    assert(byName.columns.toSet == Set("customer_id", "total_purchase_7d", "total_purchase_30d"))
    assert(store.tableExists("customer_features"))
    assert(store.listTables().contains("customer_features"))
  }

  test("catalog metadata (PKs, description) survives in table properties") {
    val df = CsvIngest.readInferred(spark, refData("product_features.csv"))
    store.createTable("product_features", Seq("product_id"), df, "Product's \"features\"")
    val ft = store.getTable("product_features")
    assert(ft.primaryKeys == Seq("product_id"))
    assert(ft.description == "Product's \"features\"")
  }

  test("catalog createTable enforces the PK contract") {
    val dup = Seq((1, "a"), (1, "b")).toDF("id", "v")
    intercept[PrimaryKeyViolation] {
      store.createTable("dup_cat", Seq("id"), dup)
    }
  }

  test("catalog dropTable is idempotent") {
    store.createTable("tmp_cat", Seq("id"), Seq((1, "x")).toDF("id", "v"))
    store.dropTable("tmp_cat")
    store.dropTable("tmp_cat")
    assert(!store.tableExists("tmp_cat"))
  }

  test("TrainingSet.fromStore assembles lookups from the catalog store") {
    val df = CsvIngest.readInferred(spark, refData("customer_features.csv"))
    if (!store.tableExists("customer_features"))
      store.createTable("customer_features", Seq("customer_id"), df)
    val labels = CsvIngest.readInferred(spark, refData("training_labels.csv"))
    val ts = TrainingSet.fromStore(store, labels,
      Seq(FeatureLookup("customer_features", Seq("total_purchase_7d"),
        "customer_id", hint = LookupHint.Broadcast)),
      labelColumn = Some("purchased"),
      excludeColumns = Seq("customer_id"))
    val out = ts.loadDf
    assert(out.count() == 500)
    assert(out.columns.toSet == Set("product_id", "on_sales", "purchased", "total_purchase_7d"))
  }

  test("identifiers are backtick-quoted: reserved-word table names work") {
    // `select` passes Spark's catalog name validation but breaks every
    // unquoted generated statement (ALTER TABLE db.select ...) — the
    // round-trip below only works because the store quotes identifiers.
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    store.createTable("select", Seq("id"), df, "reserved-word name")
    assert(store.tableExists("select"))
    assert(store.readTable("select").count() == 2)
    assert(store.getTable("select").primaryKeys == Seq("id"))
    store.dropTable("select")
    assert(!store.tableExists("select"))

    // Hyphenated names are rejected by Spark's SessionCatalog itself
    // (validateName allows only [A-Za-z0-9_]) — quoting cannot and should
    // not bypass catalog validation; the store surfaces Spark's clear error.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      store.createTable("cust-features-v2", Seq("id"), df)
    }
    assert(e.getMessage.contains("not a valid name"))
  }

  test("bucketed createTable round-trips data and registers the bucket spec") {
    val df = Tables.customer(spark, sf)
    store.createTable("customer_bucketed_t", Seq("c_custkey"), df,
      "bucketed", buckets = 4)
    val back = store.readTable("customer_bucketed_t")
    assert(back.count() == df.count())
    // The catalog must carry the bucket spec (that is what later joins use).
    val ddl = spark.sql("SHOW CREATE TABLE graft_test_db.customer_bucketed_t")
      .head().getString(0)
    assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"), ddl)
    // Bucket columns that don't exist fail fast.
    intercept[IllegalArgumentException] {
      store.createTable("customer_bucketed_bad", Seq("c_custkey"), df,
        "bad", buckets = 4, bucketColumns = Seq("nope"))
    }
  }

  test("catalog upsert merges by PK and keeps metadata") {
    store.createTable("cat_upsert_t", Seq("id"),
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "merge target")
    store.upsert("cat_upsert_t", Seq((2L, "B"), (9L, "new")).toDF("id", "v"))
    val got = store.readTable("cat_upsert_t").orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "new"))
    // graft properties survive the rewrite (a fresh store re-attaches).
    val fresh = new CatalogFeatureStore(spark, "graft_test_db",
      Some(s"$warehouse/graft_test_db.db"))
    assert(fresh.getTable("cat_upsert_t").primaryKeys == Seq("id"))
    assert(fresh.getTable("cat_upsert_t").description == "merge target")
  }

  test("catalog upsert preserves the bucket spec (zero-exchange joins survive refresh)") {
    val df = Tables.customer(spark, sf)
    store.createTable("cust_bucket_up", Seq("c_custkey"), df, "bucketed", buckets = 4)
    store.upsert("cust_bucket_up",
      df.filter(col("c_custkey") <= 10).withColumn("c_acctbal", col("c_acctbal") * 0))
    val ddl = spark.sql("SHOW CREATE TABLE graft_test_db.cust_bucket_up")
      .head().getString(0)
    assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"),
      s"bucket spec lost on upsert: $ddl")
    assert(store.readTable("cust_bucket_up").count() == df.count())
    assert(store.readTable("cust_bucket_up")
      .filter(col("c_custkey") <= 10 && col("c_acctbal") =!= 0).count() == 0)
  }

  test("orphan cleanup refuses to delete directories holding foreign files") {
    val df = Seq((1, "a")).toDF("id", "v")
    // Simulate a stale location that contains a file the store never wrote:
    // createTable must refuse rather than recursively delete user data.
    val loc = new java.io.File(s"$warehouse/graft_test_db.db/precious_tbl")
    assert(loc.mkdirs())
    java.nio.file.Files.write(loc.toPath.resolve("user_notes.txt"),
      "not a table remnant".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      store.createTable("precious_tbl", Seq("id"), df)
    }
    assert(e.getMessage.contains("user_notes.txt"))
    assert(loc.toPath.resolve("user_notes.txt").toFile.exists()) // untouched

    // Hidden user files are NOT remnants either (no blanket dot-file rule).
    java.nio.file.Files.delete(loc.toPath.resolve("user_notes.txt"))
    java.nio.file.Files.write(loc.toPath.resolve(".env"), "SECRET=1".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      store.createTable("precious_tbl", Seq("id"), df)
    }
    assert(loc.toPath.resolve(".env").toFile.exists())
    java.nio.file.Files.delete(loc.toPath.resolve(".env"))
    java.nio.file.Files.write(loc.toPath.resolve("user_notes.txt"),
      "not a table remnant".getBytes("UTF-8"))

    // Genuine remnants (parquet files from a forgotten table) ARE cleared.
    java.nio.file.Files.delete(loc.toPath.resolve("user_notes.txt"))
    java.nio.file.Files.write(loc.toPath.resolve("part-0000.snappy.parquet"),
      Array[Byte](1, 2, 3))
    store.createTable("precious_tbl", Seq("id"), df)
    assert(store.readTable("precious_tbl").count() == 1)
    store.dropTable("precious_tbl")
  }

  test("requireFiles passes when present and fails fast naming the missing") {
    SourceValidation.requireFiles(spark, "/root/reference/data",
      Seq("customer_features.csv", "product_features.csv", "training_labels.csv"))
    val e = intercept[IllegalArgumentException] {
      SourceValidation.requireFiles(spark, "/root/reference/data", Seq("nope.csv"))
    }
    assert(e.getMessage.contains("nope.csv"))
    intercept[IllegalArgumentException] {
      SourceValidation.listFiles(spark, "/root/reference/data/does_not_exist")
    }
  }

  test("anyNull and nullAudit report nulls in one pass") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("x", "y")
    assert(Validation.anyNull(df, Seq("x", "y")))
    assert(!Validation.anyNull(df.na.drop(), Seq("x", "y")))
    val audit = Validation.nullAudit(df, Seq("x", "y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(audit.toSeq == Seq(("x", 1L, 3L), ("y", 1L, 3L)))
  }

  test("expectations: one-pass suite counts violations with null = violation") {
    val df = Seq(
      (Some(1), Some(10.0)),  // passes both
      (Some(2), Some(-1.0)),  // fails positive
      (None, Some(5.0)),      // fails key_set
      (Some(4), None))        // NULL price => pessimistic violation
      .toDF("k", "price")
    val out = Validation.expectations(df, Seq(
      Validation.Expectation("key_set", col("k").isNotNull),
      Validation.Expectation("positive", col("price") > 0))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("key_set", 4L, 1L, false),
      ("positive", 4L, 2L, false)))
    // A clean frame passes everything.
    val clean = Validation.expectations(df.na.drop().filter(col("price") > 0),
      Seq(Validation.Expectation("positive", col("price") > 0))).collect()
    assert(clean.forall(_.getBoolean(3)))
    // Duplicate rule names are a caller bug, not a silent column collision.
    intercept[IllegalArgumentException] {
      Validation.expectations(df, Seq(
        Validation.Expectation("dup", col("k").isNotNull),
        Validation.Expectation("dup", col("price") > 0)))
    }
  }

  test("psi drift: zero for identical distributions, positive for a shift") {
    import spark.implicits._
    // Same uniform values on both sides of the split: every psi term is 0.
    val same = (0 until 1000).map(i => (i % 100 * 1.0, i % 2 == 0)).toDF("v", "ref")
    val calm = Validation.psiDrift(same, col("ref"), "v", 10.0, 10).collect()
    assert(calm.length == 10)
    calm.foreach(r => assert(r.getDouble(5) == 0.0))

    // Current split shifted up by 50: mass moves across bins, PSI > 0.25.
    val drifted = ((0 until 500).map(i => (i % 100 * 1.0, true)) ++
      (0 until 500).map(i => (i % 100 * 1.0 + 50, false))).toDF("v", "ref")
    val psi = Validation.psiDrift(drifted, col("ref"), "v", 10.0, 10).collect()
      .map(_.getDouble(5)).sum
    assert(psi > 0.25, s"expected drifted PSI > 0.25, got $psi")
    // Bin counts partition both sides completely.
    val rows = Validation.psiDrift(drifted, col("ref"), "v", 10.0, 10).collect()
    assert(rows.map(_.getLong(1)).sum == 500 && rows.map(_.getLong(2)).sum == 500)
  }

  test("approx profile: close to exact, and the plan carries no Expand") {
    val orders = Tables.orders(spark, sf)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val exact = Validation.profile(orders, cols).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approxDf = Validation.profile(orders, cols, exactDistinct = false)
    // The scale path must not replicate the input per distinct aggregate.
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile still plans an Expand")
    val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e <= 0.15, s"$c: approx $a vs exact $e")
    }
    // Everything except the distinct estimate is identical in both modes.
    val exactRest = Validation.profile(orders, cols).drop("n_distinct").collect().toSeq
    val approxRest = approxDf.drop("n_distinct").collect().toSeq
    assert(exactRest == approxRest)
  }
}
