package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the scale pattern for a join whose build
  * side is too big to broadcast as a hash relation but whose KEY SET fits
  * a bloom filter (a 10M-key dimension is a ~12 MB bloom at 1% fpp, vs
  * gigabytes of broadcast rows). The fact side is filtered by
  * `might_contain(bloom, key)` BEFORE its shuffle, so rows that cannot
  * join never leave the scan stage; the exact join afterwards removes the
  * bloom's false positives. No false negatives exist, so the result is
  * provably identical to the plain join (q86 hash-matches the plain-join
  * oracle).
  *
  * This is what Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects when its
  * cost heuristics fire; the explicit operator makes the pruning a
  * declared part of the pipeline rather than a planner maybe, and works
  * on any dim/fact pair the caller knows is prunable. The membership test
  * itself is Spark's codegen'd [[BloomFilterMightContain]] — no UDF.
  */
object BloomPrune {

  val FunctionName = "graft_bloom_might_contain"

  /** Idempotently register might_contain(bloom binary, key bigint) so the
    * Column DSL (and SQL) can reach the codegen'd expression. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(FunctionName, builder, "built-in")
  }

  private def builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$FunctionName expects (bloom binary, key bigint)")
    BloomFilterMightContain(exprs.head, exprs(1))
  }

  /** injectFunction descriptor for [[graft.GraftExtensions]]. */
  def description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(FunctionName),
      new ExpressionInfo(classOf[BloomFilterMightContain].getCanonicalName, null,
        FunctionName,
        s"$FunctionName(bloom, key) - bloom-filter membership test (codegen'd)", ""),
      builder)

  /** Serialize the distinct values of `dim.dimKey` (an integral column)
    * into a bloom filter usable as a literal. Driver memory is the bloom's
    * fixed size (`expectedItems`/`fpp`), never the dimension's row count. */
  def keyBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val integral = Set("tinyint", "smallint", "int", "bigint")
    val dt = dim.schema(dimKey).dataType.simpleString
    require(integral(dt), s"bloom join key must be integral, $dimKey is $dt")
    // stat.bloomFilter putLong()s integral values; BloomFilterMightContain
    // calls mightContainLong() — the two sides hash identically.
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `fact ⋈ dim` with the fact side bloom-pruned before its shuffle.
    * Result is exactly the inner equi-join (false positives die in the
    * exact join). `expectedItems` bounds the bloom's size/driver cost —
    * size it at the dim's distinct-key count. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    register(spark)
    val bytes = keyBloom(dim, dimKey, expectedItems, fpp)
    val pruned = fact.filter(mightContain(lit(bytes), col(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** The membership test as a Column. */
  def mightContain(bloom: Column, key: Column): Column =
    call_function(FunctionName, bloom, key.cast("bigint"))
}
