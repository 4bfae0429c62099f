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

  test("ANN lifecycle queries compose in any order (shared base stays immutable)") {
    // q162/q163/q168 admit a co-located delta into the SHARED memoized
    // base (byte-identical b0 segment, so re-admission is idempotent);
    // q164/q165/q166/q167/q169 write only EXTERNAL scratch roots and
    // load with explicit deltaRoots, so no query ever sees another's
    // segments by accident. Pin it at board level: run the whole family,
    // then re-run each member in a scrambled order — every result must
    // be unchanged by its siblings having mutated their (isolated) state
    // in between.
    def rows(q: String): Seq[Seq[Any]] =
      SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq
    val first = Seq("q164_stream_ivf_admit", "q162_ivf_admit",
      "q167_pq_delete", "q165_ivf_delete", "q169_external_compact",
      "q163_ivf_compact", "q168_ivf_imbalance", "q166_pq_admit")
      .map(q => q -> rows(q)).toMap
    Seq("q163_ivf_compact", "q168_ivf_imbalance", "q165_ivf_delete",
      "q166_pq_admit", "q169_external_compact", "q164_stream_ivf_admit",
      "q167_pq_delete", "q162_ivf_admit").foreach { q =>
      assert(rows(q) == first(q), s"$q changed after its siblings ran")
    }
  }
}
