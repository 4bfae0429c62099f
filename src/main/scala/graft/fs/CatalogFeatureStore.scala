package graft.fs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-backed feature store — the reference's actual registration path
  * (S6): `CREATE DATABASE IF NOT EXISTS sales`
  * (notebooks/01_feature_table_creation.py:109-115) plus named tables read
  * back through the catalog (`workspace.sales.customer_features`,
  * notebooks/02_model_training.py:74,80).
  *
  * Tables are registered with `saveAsTable` and read via `spark.table`, so
  * any session sharing the metastore resolves them by name — the contract
  * every downstream user of the reference relies on. PK and description
  * metadata ride as table properties (`graft.primaryKeys`,
  * `graft.description`). Identifiers are backtick-quoted in every generated
  * statement, so hyphenated or otherwise non-trivial database/table names
  * work (and name interpolation can never escape the identifier position).
  *
  * Format note: the reference materializes feature tables as Delta; this
  * sandbox has no Delta jars (offline), so tables are parquet — swapping
  * `format("parquet")` for `format("delta")` is the only change needed on a
  * Delta-enabled cluster (see README "Deviations").
  */
final class CatalogFeatureStore(
    spark: SparkSession,
    val database: String,
    location: Option[String] = None) extends FeatureResolver {

  override protected def resolverSession: SparkSession = spark

  /** Backtick-quote one identifier part (embedded backticks doubled). */
  private def bq(id: String): String = "`" + id.replace("`", "``") + "`"

  locally {
    val loc = location.map(l => s" LOCATION '${l.replace("'", "''")}'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${bq(database)}$loc")
  }

  private def fullName(name: String) = s"${bq(database)}.${bq(name)}"

  /** The database's physical location (resolved once from the catalog). */
  private lazy val databaseLocation: String =
    spark.sql(s"DESCRIBE DATABASE ${bq(database)}")
      .collect()
      .collectFirst { case r if r.getString(0) == "Location" => r.getString(1) }
      .getOrElse(sys.error(s"DESCRIBE DATABASE $database returned no Location"))

  /** File names a Spark parquet table write leaves behind. Orphan cleanup
    * (below) refuses to touch a directory holding anything else — the list
    * is intentionally exact (no blanket dot-file rule: a hidden user file
    * like `.env` is NOT a table remnant and must be protected). */
  private def isTableRemnant(fileName: String): Boolean =
    fileName == "_SUCCESS" || fileName.endsWith(".parquet") ||
      fileName.endsWith(".crc") || fileName.startsWith("_committed") ||
      fileName.startsWith("_started")

  /** Register `df` as `database.name` with the same PK contract as the
    * path-backed store (uniqueness enforced distributed, at write time).
    * Overwrite-idempotent across sessions: a non-persistent metastore (the
    * local in-memory catalog) forgets tables between sessions while their
    * files remain, so an orphaned table location is cleared before the
    * write — but ONLY when its contents are recognizably the remnants of a
    * previous parquet table write. A directory holding anything else is
    * never deleted: the store must not destroy files it did not write
    * (createTable fails with a clear message instead, and the user decides).
    */
  def createTable(
      name: String,
      primaryKeys: Seq[String],
      df: DataFrame,
      description: String = "",
      enforcePrimaryKey: Boolean = true,
      buckets: Int = 0,
      bucketColumns: Seq[String] = Nil): FeatureTable = {
    FeatureStore.validatePrimaryKeys(name, primaryKeys, df, enforcePrimaryKey)
    if (!tableExists(name)) {
      val orphan = new org.apache.hadoop.fs.Path(s"$databaseLocation/$name")
      val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(orphan)) {
        val entries = fs.listStatus(orphan).map(_.getPath.getName)
        val strangers = entries.filterNot(isTableRemnant)
        if (strangers.nonEmpty)
          throw new IllegalStateException(
            s"createTable($name): location $orphan exists but holds files this " +
              s"store did not write (${strangers.take(5).mkString(", ")}); " +
              "refusing to delete — move them aside or drop the directory manually")
        System.err.println(s"[graft] createTable($name): clearing orphaned table files at $orphan")
        fs.delete(orphan, true)
      }
    }
    // Bucketing: hash-cluster the table into `buckets` files by
    // `bucketColumns` (default: the primary keys) and sort within each
    // bucket. Two tables bucketed the same way on their join key sort-merge
    // join with ZERO exchange — the shuffle was paid once at write time and
    // is amortized over every subsequent join (q63 proves the plan). The
    // pre-write repartition on the bucket key gives each bucket exactly one
    // file, so the join also skips the per-bucket sort.
    val bucketCols = if (bucketColumns.nonEmpty) bucketColumns else primaryKeys
    val writer =
      if (buckets > 0) {
        val missing = bucketCols.filterNot(df.columns.contains)
        require(missing.isEmpty, s"bucket columns not in dataframe: ${missing.mkString(", ")}")
        df.repartition(buckets, bucketCols.map(df(_)): _*)
          .write
          .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
      } else df.write
    writer.mode("overwrite").format("parquet").saveAsTable(fullName(name))
    spark.sql(
      s"""ALTER TABLE ${fullName(name)} SET TBLPROPERTIES (
         |  'graft.primaryKeys' = '${primaryKeys.mkString(",").replace("'", "''")}',
         |  'graft.description' = '${description.replace("'", "''")}')""".stripMargin)
    invalidatePointIndex(name) // a rewrite must not leave a stale broadcast
    FeatureTable(name, primaryKeys, description, df.schema, fullName(name))
  }

  /** PK-keyed merge write for the catalog mode — same contract as
    * [[FeatureStore.upsert]] (matched keys replaced, rest survive, new
    * keys append). The merged frame is pinned with a localCheckpoint
    * before `saveAsTable(overwrite)` (Spark refuses to overwrite a table
    * its own plan is reading), and the table's bucket spec + graft
    * properties are restored after the rewrite, so a bucketed table keeps
    * its zero-exchange join property across refreshes. On Delta this
    * whole method is `MERGE INTO`; the checkpoint-and-rewrite is the
    * plain-parquet fallback and costs one materialization of the table. */
  def upsert(name: String, updates: DataFrame): FeatureTable = {
    val ft = getTable(name)
    FeatureStore.validatePrimaryKeys(name, ft.primaryKeys, updates, enforce = true)
    val existing = readTable(name)
    require(existing.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert($name): column mismatch — table has ${existing.columns.sorted.mkString(",")}, " +
        s"updates have ${updates.columns.sorted.mkString(",")}")
    val merged = existing
      .join(updates.select(ft.primaryKeys.map(org.apache.spark.sql.functions.col): _*),
        ft.primaryKeys, "left_anti")
      .unionByName(updates)
      .localCheckpoint(true)
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    val bucketSpec = catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some(database))).bucketSpec
    val writer = bucketSpec match {
      case Some(bs) =>
        val cols = bs.bucketColumnNames
        val w = merged.repartition(bs.numBuckets, cols.map(merged(_)): _*)
          .write.bucketBy(bs.numBuckets, cols.head, cols.tail: _*)
        if (bs.sortColumnNames.nonEmpty)
          w.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
        else w
      case None => merged.write
    }
    writer.mode("overwrite").format("parquet").saveAsTable(fullName(name))
    spark.sql(
      s"""ALTER TABLE ${fullName(name)} SET TBLPROPERTIES (
         |  'graft.primaryKeys' = '${ft.primaryKeys.mkString(",").replace("'", "''")}',
         |  'graft.description' = '${ft.description.replace("'", "''")}')""".stripMargin)
    invalidatePointIndex(name)
    FeatureTable(name, ft.primaryKeys, ft.description, merged.schema, fullName(name))
  }

  /** Read a registered table by name (reference: 02_model_training.py:145). */
  override def readTable(name: String): DataFrame = spark.table(fullName(name))

  /** Re-hydrate table metadata from catalog properties. */
  override def getTable(name: String): FeatureTable = {
    val props = spark.sql(s"SHOW TBLPROPERTIES ${fullName(name)}")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    FeatureTable(
      name,
      props.get("graft.primaryKeys").map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      props.getOrElse("graft.description", ""),
      readTable(name).schema,
      fullName(name))
  }

  def tableExists(name: String): Boolean = spark.catalog.tableExists(fullName(name))

  /** Idempotent drop (reference: 01_feature_table_creation.py:153-160). */
  def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${fullName(name)}")
    invalidatePointIndex(name)
  }

  def listTables(): Seq[String] =
    spark.catalog.listTables(database).collect().map(_.name).toSeq.sorted
}
