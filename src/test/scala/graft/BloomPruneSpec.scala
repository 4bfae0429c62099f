package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

class BloomPruneSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf)
  private lazy val richSuppliers = Tables.supplier(spark, sf)
    .filter(col("s_acctbal") > 5000)

  private lazy val plainJoin = li.join(richSuppliers, li("l_suppkey") === col("s_suppkey"))
    .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    .orderBy("l_orderkey", "l_linenumber")

  test("bloom-pruned join returns exactly the plain join") {
    val pruned = BloomPrune.bloomPrunedJoin(li, richSuppliers, "l_suppkey", "s_suppkey",
        expectedItems = 10000)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
      .orderBy("l_orderkey", "l_linenumber")
    assert(pruned.collect().toSeq == plainJoin.collect().toSeq)
  }

  test("an undersized, high-fpp bloom is still exact (false positives die in the join)") {
    val pruned = BloomPrune.bloomPrunedJoin(li, richSuppliers, "l_suppkey", "s_suppkey",
        expectedItems = 8, fpp = 0.5)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
      .orderBy("l_orderkey", "l_linenumber")
    assert(pruned.collect().toSeq == plainJoin.collect().toSeq)
  }

  test("the membership filter is in the physical plan, before the join") {
    val pruned = BloomPrune.bloomPrunedJoin(li, richSuppliers, "l_suppkey", "s_suppkey",
      expectedItems = 10000)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a BloomFilterMightContain filter in the plan:\n$plan")
  }

  test("the filter actually prunes fact rows before the join") {
    // Only a subset of suppliers survives the acctbal cut, so the bloom
    // must reject most fact rows pre-join (modulo false positives).
    BloomPrune.register(spark)
    val bytes = BloomPrune.keyBloom(richSuppliers, "s_suppkey", 10000, 0.01)
    val kept = li.filter(BloomPrune.mightContain(lit(bytes), col("l_suppkey"))).count()
    val total = li.count()
    val matching = plainJoin.count()
    assert(kept < total, "bloom rejected nothing — no pruning happened")
    assert(kept >= matching, "bloom must never reject a joining row")
  }

  test("non-integral keys are rejected with a clear error") {
    val err = intercept[IllegalArgumentException] {
      BloomPrune.keyBloom(Tables.supplier(spark, sf), "s_name", 100, 0.01)
    }
    assert(err.getMessage.contains("integral"))
  }
}
