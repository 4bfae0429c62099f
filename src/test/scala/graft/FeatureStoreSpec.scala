package graft


import org.apache.spark.sql.functions.col

import graft.fs.{FeatureStore, PrimaryKeyViolation}
import graft.ingest.CsvIngest

class FeatureStoreSpec extends SparkSpec {

  private lazy val base = tempDir("graft_fs")
  private lazy val store = new FeatureStore(spark, base)

  test("createTable registers a primary-keyed table and readTable round-trips") {
    val df = CsvIngest.readInferred(spark, refData("customer_features.csv"))
    val ft = store.createTable("customer_features", Seq("customer_id"), df,
      "Customer purchase features")
    assert(ft.primaryKeys == Seq("customer_id"))
    val back = store.readTable("customer_features")
    assert(back.count() == 100)
    assert(back.columns.toSet == Set("customer_id", "total_purchase_7d", "total_purchase_30d"))
  }

  test("createTable rejects duplicate primary keys") {
    import spark.implicits._
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v")
    intercept[PrimaryKeyViolation] {
      store.createTable("dup_table", Seq("id"), dup)
    }
  }

  test("createTable rejects null primary keys") {
    import spark.implicits._
    val withNull = Seq((Some(1), "a"), (None, "b")).toDF("id", "v")
    intercept[PrimaryKeyViolation] {
      store.createTable("null_pk_table", Seq("id"), withNull)
    }
  }

  test("createTable validates PK column presence") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      store.createTable("bad_pk", Seq("nope"), df)
    }
  }

  test("dropTable is idempotent and removes data") {
    import spark.implicits._
    store.createTable("tmp_table", Seq("id"), Seq((1, "x")).toDF("id", "v"))
    store.dropTable("tmp_table")
    store.dropTable("tmp_table") // second call: no-op
    assert(!store.tableExists("tmp_table"))
  }

  test("metadata sidecar lets a fresh store re-attach PK info") {
    val df = CsvIngest.readInferred(spark, refData("product_features.csv"))
    store.createTable("product_features", Seq("product_id"), df, "Product features")
    val fresh = new FeatureStore(spark, base)
    val ft = fresh.getTable("product_features")
    assert(ft.primaryKeys == Seq("product_id"))
    assert(fresh.readTable("product_features").count() == 50)
  }

  test("hostile descriptions (quotes, newlines, backslashes) survive re-attach") {
    import spark.implicits._
    val desc = "line1 \"quoted\", comma\nline2 \\backslash\\ and a ] bracket"
    store.createTable("hostile_meta", Seq("id"), Seq((1, "x")).toDF("id", "v"), desc)
    val fresh = new FeatureStore(spark, base)
    val ft = fresh.getTable("hostile_meta")
    assert(ft.description == desc)
    assert(ft.primaryKeys == Seq("id"))
  }

  test("lookupOne retrieves a feature row by primary key (J3 batch analog)") {
    store.createTable("point_lookup",
      Seq("customer_id"),
      CsvIngest.readInferred(spark, refData("customer_features.csv")))
    val hit = store.lookupOne("point_lookup", 1)
    assert(hit.isDefined)
    assert(hit.get.getAs[Double]("total_purchase_7d") > 0.0)
    // Warm path: the broadcast index is built once; repeated lookups are
    // in-memory hash probes (no Spark job) — time a batch to prove it.
    val t0 = System.nanoTime()
    (1 to 100).foreach(i => store.lookupOne("point_lookup", i))
    val perLookupMs = (System.nanoTime() - t0) / 1e6 / 100
    assert(perLookupMs < 10.0, s"warm point lookup took $perLookupMs ms")
    assert(store.lookupOne("point_lookup", 99999).isEmpty)
  }

  test("lookupOne never serves stale data after a table rewrite or drop") {
    import spark.implicits._
    store.createTable("mutable_tbl", Seq("id"),
      Seq((1, "old")).toDF("id", "v"))
    assert(store.lookupOne("mutable_tbl", 1).get.getAs[String]("v") == "old")
    // Rewrite: the broadcast index must be invalidated, not served stale.
    store.createTable("mutable_tbl", Seq("id"),
      Seq((1, "new")).toDF("id", "v"))
    assert(store.lookupOne("mutable_tbl", 1).get.getAs[String]("v") == "new")
    store.dropTable("mutable_tbl")
    intercept[Exception] { store.lookupOne("mutable_tbl", 1) } // table gone
  }

  test("partitioned createTable lays out hive dirs and re-attaches in a fresh store") {
    val df = Tables.customer(spark, sf)
    store.createTable("customer_partitioned", Seq("c_custkey"), df,
      "partitioned by segment", partitionBy = Seq("c_mktsegment"))
    // Hive-style layout: one directory per segment value.
    val dirs = new java.io.File(s"$base/customer_partitioned").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("c_mktsegment=")), s"no partition dirs: $dirs")
    // Full round-trip (partition column restored as a data column).
    val back = store.readTable("customer_partitioned")
    assert(back.count() == df.count())
    assert(back.columns.contains("c_mktsegment"))
    // A fresh store over the same path re-attaches from the sidecar even
    // with the partitioned layout (meta file must not break discovery).
    val fresh = new FeatureStore(spark, base)
    assert(fresh.getTable("customer_partitioned").primaryKeys == Seq("c_custkey"))
    assert(fresh.readTable("customer_partitioned").count() == df.count())
  }

  test("upsert replaces matched keys, keeps the rest, appends new keys") {
    import spark.implicits._
    store.createTable("upsert_tbl", Seq("id"),
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    store.upsert("upsert_tbl",
      Seq((2, "B2"), (9, "new")).toDF("id", "v"))
    val got = store.readTable("upsert_tbl").orderBy("id").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(got == Seq(1 -> "a", 2 -> "B2", 3 -> "c", 9 -> "new"))
    // The PK contract holds on the update set too.
    intercept[PrimaryKeyViolation] {
      store.upsert("upsert_tbl", Seq((5, "x"), (5, "y")).toDF("id", "v"))
    }
    // Schema drift is rejected, not silently merged.
    intercept[IllegalArgumentException] {
      store.upsert("upsert_tbl", Seq((1, "z", 0.5)).toDF("id", "v", "extra"))
    }
  }

  test("compact collapses a many-file table to one file, data unchanged") {
    import spark.implicits._
    val wide = spark.range(0, 1000).toDF("id")
      .repartition(16)
      .withColumn("v", col("id") * 2)
    store.createTable("compact_tbl", Seq("id"), wide)
    def files() = new java.io.File(s"$base/compact_tbl").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() > 1, "fixture should start with many files")
    val before = store.readTable("compact_tbl").orderBy("id").collect().toSeq
    store.compact("compact_tbl")
    assert(files() == 1)
    assert(store.readTable("compact_tbl").orderBy("id").collect().toSeq == before)
    // Metadata survived the rewrite.
    assert(store.getTable("compact_tbl").primaryKeys == Seq("id"))
  }

  test("vacuum prunes retained versions, keeps history, fails stale time travel loudly") {
    import spark.implicits._
    store.createTable("vac_tbl", Seq("id"), Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // Three mutations → three retained snapshots.
    (1 to 3).foreach(i => store.upsert("vac_tbl", Seq((1, s"a$i")).toDF("id", "v")))
    assert(store.versions("vac_tbl") == Seq(1L, 2L, 3L))
    val current = store.readTable("vac_tbl").orderBy("id").collect().toSeq
    val pruned = store.vacuum("vac_tbl", 1)
    assert(pruned == Seq(1L, 2L))
    assert(store.versions("vac_tbl") == Seq(3L))
    // Current state untouched; surviving snapshot still readable.
    assert(store.readTable("vac_tbl").orderBy("id").collect().toSeq == current)
    assert(store.readTableVersion("vac_tbl", 3L).count() == 2L)
    // Time travel to a vacuumed version fails with a clear message.
    val e = intercept[IllegalArgumentException] {
      store.readTableVersion("vac_tbl", 1L)
    }
    assert(e.getMessage.contains("not retained"))
    // The audit log is complete: mutations AND the vacuum itself.
    assert(store.history("vac_tbl").map(_.op) ==
      Seq("create", "upsert", "upsert", "upsert", "vacuum"))
    // Vacuuming an unknown table is an error, not a no-op.
    intercept[Exception] { store.vacuum("no_such_tbl", 1) }
  }

  test("upsert preserves a partitioned table's layout") {
    import spark.implicits._
    store.createTable("upsert_part_tbl", Seq("id"),
      Seq((1, "x", "p1"), (2, "y", "p2")).toDF("id", "v", "part"),
      partitionBy = Seq("part"))
    store.upsert("upsert_part_tbl", Seq((2, "Y2", "p2"), (3, "z", "p3")).toDF("id", "v", "part"))
    val dirs = new java.io.File(s"$base/upsert_part_tbl").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("part=p1", "part=p2", "part=p3"), s"layout lost: $dirs")
    val got = store.readTable("upsert_part_tbl").orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("v"))).toSeq
    assert(got == Seq(1 -> "x", 2 -> "Y2", 3 -> "z"))
  }

  test("CSV schema inference matches the reference expectation") {
    val df = CsvIngest.readInferred(spark, refData("customer_features.csv"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("customer_id") == "int")
    assert(types("total_purchase_7d") == "double")
    assert(types("total_purchase_30d") == "double")
  }

  test("requireNonEmpty and requireColumns guard ingestion") {
    val df = CsvIngest.readInferred(spark, refData("training_labels.csv"))
    CsvIngest.requireNonEmpty(df, "labels")
    CsvIngest.requireColumns(df, Seq("customer_id", "product_id", "purchased"), "labels")
    intercept[IllegalArgumentException] {
      CsvIngest.requireColumns(df, Seq("missing_col"), "labels")
    }
    assert(df.filter(col("purchased") === 1).count() == 293)
    assert(df.filter(col("purchased") === 0).count() == 207)
  }

  test("upserts create version snapshots; time travel reads them back") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_tt"))
    s.createTable("tt", Seq("id"), Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(s.versions("tt").isEmpty) // creation is not a mutation
    s.upsert("tt", Seq((2L, "B")).toDF("id", "v"))
    s.upsert("tt", Seq((3L, "c")).toDF("id", "v"))
    assert(s.versions("tt") == Seq(1L, 2L))
    // v1 = state before the first upsert; v2 = before the second.
    assert(s.readTableVersion("tt", 1L).orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
    assert(s.readTableVersion("tt", 2L).orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("a", "B"))
    assert(s.readTable("tt").count() == 3)
    intercept[IllegalArgumentException] { s.readTableVersion("tt", 99L) }
  }

  test("rollback restores a snapshot and is itself undoable") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_rb"))
    s.createTable("rb", Seq("id"), Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    s.upsert("rb", Seq((1L, 99.0)).toDF("id", "v"))
    s.rollback("rb", 1L) // back to the original
    assert(s.readTable("rb").orderBy("id").collect().map(_.getDouble(1)).toSeq
      == Seq(10.0, 20.0))
    // The rollback snapshotted the upserted state as v2 — undo the undo.
    assert(s.versions("rb") == Seq(1L, 2L))
    s.rollback("rb", 2L)
    assert(s.readTable("rb").orderBy("id").collect().map(_.getDouble(1)).toSeq
      == Seq(99.0, 20.0))
    // Point lookups track the live state through rollbacks.
    assert(s.lookupOne("rb", 1L).get.getDouble(1) == 99.0)
  }

  test("tableChanges emits CDF-style rows: insert, delete, update pre/postimage") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_cdc"))
    s.createTable("cdc", Seq("id"), Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    s.upsert("cdc", Seq((2L, "B"), (4L, "d")).toDF("id", "v")) // snapshot v1 = original
    val fwd = s.tableChanges("cdc", 1L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // 1 and 3 are unchanged -> absent; 2 updated (both images); 4 inserted.
    assert(fwd.toSeq == Seq(
      (2L, "B", "update_postimage"), // 'post' < 'pre' lexically
      (2L, "b", "update_preimage"),
      (4L, "d", "insert")))
    // Roll back to the original: the diff against the upserted snapshot
    // (v2) now shows the reverse — 2 un-updated, 4 deleted.
    s.rollback("cdc", 1L)
    val back = s.tableChanges("cdc", 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(back.toSeq == Seq(
      (2L, "b", "update_postimage"),
      (2L, "B", "update_preimage"),
      (4L, "d", "delete")))
  }

  test("tableChanges null-safe comparison: null -> null is unchanged, null -> value is an update") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_cdcn"))
    s.createTable("cdcn", Seq("id"),
      Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("id", "v"))
    s.upsert("cdcn", Seq((1L, None: Option[String]), (2L, Some("x"))).toDF("id", "v"))
    val out = s.tableChanges("cdcn", 1L).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
    assert(out.toSeq == Seq(
      (2L, Some("x"), "update_postimage"),
      (2L, None, "update_preimage")))
  }

  test("lookupOneScan: pushed-down point read matches the broadcast path") {
    store.createTable("scan_lookup", Seq("customer_id"),
      CsvIngest.readInferred(spark, refData("customer_features.csv")))
    val viaScan = store.lookupOneScan("scan_lookup", 7)
    val viaIndex = store.lookupOne("scan_lookup", 7)
    assert(viaScan.isDefined && viaIndex.isDefined)
    assert(viaScan.get.toSeq == viaIndex.get.toSeq)
    assert(store.lookupOneScan("scan_lookup", 99999).isEmpty)
    // The PK equality must reach the parquet reader, not run post-scan.
    val plan = store.readTable("scan_lookup")
      .filter(org.apache.spark.sql.functions.col("customer_id") === 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(customer_id), EqualTo(customer_id,7)]"),
      s"PK filter not pushed to the scan:\n$plan")
    intercept[IllegalArgumentException] { store.lookupOneScan("scan_lookup", 1, 2) }
  }

  test("upsert mergeSchema evolves the table: new columns added, old rows read null") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_evo"))
    s.createTable("evo", Seq("id"), Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // New column arrives with the refresh.
    s.upsert("evo", Seq((2L, "B", 0.9), (3L, "c", 0.5)).toDF("id", "v", "score"),
      mergeSchema = true)
    val got = s.readTable("evo").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(r.fieldIndex("score"))))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "B", Some(0.9)), (3L, "c", Some(0.5))))
    // Updates narrower than the evolved table pad with nulls.
    s.upsert("evo", Seq((4L, "d")).toDF("id", "v"), mergeSchema = true)
    assert(s.readTable("evo").filter(col("id") === 4L).head().isNullAt(2))
    // Retyping a column is refused, never coerced.
    val err = intercept[IllegalArgumentException] {
      s.upsert("evo", Seq((5L, 42)).toDF("id", "v"), mergeSchema = true)
    }
    assert(err.getMessage.contains("type conflict"))
  }

  test("mergeAdditive: hand-computed incremental refresh, null-as-zero for new keys") {
    import spark.implicits._
    import graft.ops.Incremental
    val s = new FeatureStore(spark, tempDir("graft_inc"))
    s.createTable("mv", Seq("k"), Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("k", "n", "total"))
    // Batch: 'a' gains (1, 7); 'c' is brand new (3, 30); 'b' untouched.
    Incremental.mergeAdditive(s, "mv", Seq(("a", 1L, 7L), ("c", 3L, 30L)).toDF("k", "n", "total"))
    val got = s.readTable("mv").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 17L), ("b", 1L, 5L), ("c", 3L, 30L)))
    // Non-numeric partial columns are rejected up front.
    s.createTable("mv_bad", Seq("k"), Seq(("a", "text")).toDF("k", "v"))
    val err = intercept[IllegalArgumentException] {
      Incremental.mergeAdditive(s, "mv_bad", Seq(("a", "more")).toDF("k", "v"))
    }
    assert(err.getMessage.contains("numeric"))
  }

  test("delete removes matching rows, snapshots, and logs") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_del"))
    s.createTable("d", Seq("id"), Seq((1L, 5), (2L, 50), (3L, 500)).toDF("id", "v"))
    s.delete("d", col("v") >= 50)
    assert(s.readTable("d").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(s.readTableVersion("d", 1L).count() == 3) // pre-delete snapshot
    assert(s.history("d").map(_.op) == Seq("create", "delete"))
  }

  test("applyChanges replicates a source's feed onto a replica exactly (CDC round-trip)") {
    import spark.implicits._
    val dir = tempDir("graft_cdc_rt")
    val s = new FeatureStore(spark, dir)
    val t0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    s.createTable("src", Seq("id"), t0)
    s.createTable("replica", Seq("id"), t0)
    // Mutate the source: update 2, delete 3, insert 4 — two mutations, so
    // the feed spans versions (diff against the OLDEST retained = v1).
    s.upsert("src", Seq((2L, "B"), (4L, "d")).toDF("id", "v"))
    s.delete("src", col("id") === 3L)
    val feed = s.tableChanges("src", 1L)
    s.applyChanges("replica", feed)
    val src = s.readTable("src").orderBy("id").collect().toSeq
    val rep = s.readTable("replica").orderBy("id").collect().toSeq
    assert(rep == src, s"replica $rep != source $src")
    assert(rep.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("history logs every lifecycle op and outlives snapshot pruning") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_hist"),
      maxVersionsRetained = 1)
    val t0 = System.currentTimeMillis()
    s.createTable("h", Seq("id"), Seq((1L, "a")).toDF("id", "v"))
    s.upsert("h", Seq((1L, "b")).toDF("id", "v"))
    s.compact("h")
    s.rollback("h", 2L) // only v2 retained (budget = 1)
    val hist = s.history("h")
    assert(hist.map(_.op) == Seq("create", "upsert", "compact", "rollback"))
    assert(hist.map(_.snapshotVersion) == Seq(None, Some(1L), Some(2L), Some(3L)))
    assert(hist.forall(_.atMillis >= t0))
    // Snapshots v1/v2 are pruned, but the log still records them.
    assert(s.versions("h") == Seq(3L))
    // A fresh store over the same path reads the same log (it's on disk).
    val fresh = new FeatureStore(spark, s.basePath)
    assert(fresh.history("h").map(_.op) == hist.map(_.op))
  }

  test("version retention is bounded; dropTable removes snapshots") {
    import spark.implicits._
    val s = new FeatureStore(spark, tempDir("graft_ret"),
      maxVersionsRetained = 2)
    s.createTable("ret", Seq("id"), Seq((1L, 0)).toDF("id", "v"))
    (1 to 4).foreach(i => s.upsert("ret", Seq((1L, i)).toDF("id", "v")))
    assert(s.versions("ret") == Seq(3L, 4L)) // oldest pruned, ids keep advancing
    s.dropTable("ret")
    assert(s.versions("ret").isEmpty)
  }
}
