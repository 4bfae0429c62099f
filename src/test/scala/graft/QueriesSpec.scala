package graft

/** Smoke coverage: every declared query executes at sf0.001 and the flagship
  * returns rows (the driver's t1 check). Row-level correctness is covered by
  * the DuckDB oracle (driver t2 / tools/check_oracle.py). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle also exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  // Queries that may legitimately return zero rows at tiny scale.
  private val mayBeEmpty = Set("q28_ngram_jaccard", "q30_minhash_neardup",
    "q32_simhash_neardups", "q35_embedding_neardup", "q08_anti_join", "q14_symdiff",
    "q54_contamination")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
