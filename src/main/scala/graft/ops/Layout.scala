package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (the OPTIMIZE ZORDER analog — Delta's
  * clustering rewrite, re-expressed over plain parquet): rewrite a table so
  * rows close in TWO dimensions land in the same files, which makes
  * file/row-group min-max pruning effective for 2-D selective predicates.
  *
  * A table range-partitioned by one column prunes scans filtered on that
  * column only; a filter on the second column still touches every file. At
  * 100 TB the difference between "scan 16 of 10000 files" and "scan all of
  * them" IS the query cost, and the layout — not the plan — decides it.
  * Z-ordering interleaves the bits of the two columns' quantile-bucket
  * ranks, so the Morton curve visits space in compact 2-D cells; sorting
  * files along the curve gives every file a tight bounding box in BOTH
  * dimensions. Parquet column min/max stats then skip non-matching files
  * at scan time — no index structure, no reader-side change.
  *
  * Everything is driver-bounded and distributed: quantile boundaries come
  * from `approxQuantile` (a fixed-size sketch per column), bucket + Morton
  * arithmetic are codegen'd column expressions, and the rewrite is one
  * `repartitionByRange` shuffle (Spark samples the z-values for balanced
  * output files — skewed data still yields even file sizes).
  */
object Layout {

  /** Morton (Z-order) code of two bucket ids of up to 16 bits each:
    * x occupies even bit positions, y odd. Standard mask-spread bit
    * interleave, entirely in codegen'd bitwise builtins. */
  def interleaveBits(xb: Column, yb: Column): Column = {
    def spread(v: Column): Column = {
      var c = v.cast("bigint").bitwiseAND(lit(0xFFFFL))
      c = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
      c = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      c = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
      c = c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
      c
    }
    spread(xb).bitwiseOR(shiftleft(spread(yb), 1))
  }

  /** Quantile-rank a column into `nBuckets` buckets: boundaries from a
    * driver-bounded `approxQuantile` sketch, assignment as a codegen'd
    * indicator sum (monotone in the column, uniform by construction —
    * exactly Delta's range_partition_id trick). */
  def quantileBucket(df: DataFrame, colName: String, nBuckets: Int): Column =
    quantileBuckets(df, Seq(colName), nBuckets).head

  /** [[quantileBucket]] for several columns in ONE sketch pass: Spark's
    * multi-column `approxQuantile` overload runs the same per-column
    * Greenwald-Khanna sketch over a single scan (the single-column form
    * literally delegates to it), so the boundaries are bit-identical to N
    * separate calls while the table is read once instead of N times — at
    * 100 TB a D-dimensional z-order rewrite drops from D+2 full passes to
    * 3 (sketch, range-partition sampling, write). */
  def quantileBuckets(df: DataFrame, colNames: Seq[String], nBuckets: Int): Seq[Column] = {
    require(nBuckets >= 2 && nBuckets <= 65536, s"nBuckets in [2, 65536], got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val all = df.stat.approxQuantile(colNames.toArray, probs, 0.001)
    colNames.zip(all.toSeq).map { case (c, bs) =>
      val bounds = bs.distinct.sorted
      bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(c) > lit(b), 1).otherwise(0)
      }
    }
  }

  /** Morton code of D bucket ids, `bits` bits each: dimension d occupies
    * bit positions i·D + d. The general form of [[interleaveBits]] (bit
    * positions coincide at D = 2): bits·D explicit bit terms OR-folded —
    * still pure codegen'd bitwise builtins, just without the mask-spread
    * shortcut. Bounded: bits·D ≤ 63. */
  def interleaveBitsN(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.length
    require(d >= 2, s"need >= 2 dimensions, got $d")
    require(bits * d <= 63, s"bits*dims must fit a long: $bits*$d")
    val terms = for {
      i <- 0 until bits
      dim <- 0 until d
    } yield shiftleft(
      shiftright(buckets(dim).cast("bigint"), i).bitwiseAND(lit(1L)),
      i * d + dim)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` at `path` as `nFiles` parquet files clustered along the
    * Z-order curve of (`colX`, `colY`), `bits` bits per dimension
    * (2^bits quantile buckets each). Data is unchanged — only layout. */
  def zorderWrite(df: DataFrame, colX: String, colY: String, path: String,
      nFiles: Int, bits: Int = 4): Unit = {
    require(bits >= 1 && bits <= 16, s"bits in [1, 16], got $bits")
    val Seq(bx, by) = quantileBuckets(df, Seq(colX, colY), 1 << bits)
    writeAlong(df, interleaveBits(bx, by), path, nFiles)
  }

  /** N-dimensional clustered rewrite (the ZORDER BY col1, ..., colN
    * form): quantile-bucket each column, interleave all of them. More
    * dimensions share the same bit budget — per-dimension selectivity
    * degrades as D grows (the curse every multi-dim index pays), so
    * cluster on the 2-4 hottest predicate columns, not everything. */
  def zorderWriteN(df: DataFrame, cols: Seq[String], path: String,
      nFiles: Int, bits: Int = 4): Unit = {
    require(bits >= 1 && bits <= 16, s"bits in [1, 16], got $bits")
    val z = interleaveBitsN(quantileBuckets(df, cols, 1 << bits), bits)
    writeAlong(df, z, path, nFiles)
  }

  private def writeAlong(df: DataFrame, z: Column, path: String, nFiles: Int): Unit =
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)

  /** Single-dimension comparison layout (what a naive `ORDER BY colX`
    * rewrite gives you): tight bounds on `colX`, arbitrary on everything
    * else. Used by tests/benchmarks to demonstrate the z-order win. */
  def linearWrite(df: DataFrame, colX: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(colX))
      .sortWithinPartitions(colX)
      .write.mode("overwrite").parquet(path)
}
