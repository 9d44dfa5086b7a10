package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * prune-friendly file layout. The reference has no layout stage (it
  * globs per-video files, batchProcessVideos.py:93–106); at 100 TB
  * the table layout IS the index, and a space-filling-curve sort key
  * is the standard way to make file-level min/max statistics prune on
  * MORE THAN ONE column at once: sorting by `(x, y)` gives perfect
  * x-pruning and useless y-pruning, while sorting by z(x, y) bounds
  * BOTH coordinates inside every contiguous key range.
  */
object Layout {

  /** Morton (z-order) key: bit-interleave of two `bits`-bit
    * nonnegative dimensions — x on even bit positions, y on odd.
    * Pure integer Column arithmetic (shift/and/multiply), identical
    * on any engine with 64-bit math; whole-stage codegen'd, no UDF.
    * Callers quantize dims into [0, 2^bits) first. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc +
        shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }
  }

  /** The same interleave as DuckDB SQL, for oracle authoring. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { b =>
      Seq(s"(($x >> $b) & 1) * ${1L << (2 * b)}",
        s"(($y >> $b) & 1) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")

  /** Scala mirror for specs. */
  def zValueKernel(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z += ((x >> b) & 1L) << (2 * b)
      z += ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** Cluster `df` for two-column pruning: append the z key and
    * range-partition + sort by it, the write-side layout step. Each
    * output partition then covers a contiguous z range, so its
    * min/max on BOTH x and y are tight — the property the q118
    * bucket audit measures. */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int): DataFrame = {
    val keyed = df.withColumn("z", zValue(x, y, bits))
    keyed.repartitionByRange(col("z")).sortWithinPartitions(col("z"))
  }
}
