package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Deterministic GLOBAL row enumeration at scale (training-order
  * shuffles, stable example ids, resumable iteration cursors). A bare
  * `row_number() OVER (ORDER BY …)` window moves EVERY row into one
  * task — the single worst scale-killer Spark lets you write. The
  * scale-safe plan is: range-partition on the sort key, sort within
  * partitions, then add each partition's global offset. RDD
  * zipWithIndex does the offset pass: one count per partition to the
  * driver (bounded by partition count, never rows), then a map — two
  * passes total, all partitions in parallel.
  */
object Enumerate {

  /** Append 1-based global positions under the TOTAL order given by
    * `sortCols`. The order must be total (include a unique tie-break
    * column): with ties, positions within a tie group would depend on
    * the physical partitioning. Range boundaries come from Spark's
    * deterministic reservoir sampling, and with a total order the
    * positions are identical for ANY boundary placement — so the
    * result is partitioning-independent by construction. */
  def globalRowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Distributed PREFIX SUM: append the inclusive global running sum
    * of long column `valueCol` under the total order `sortCols` —
    * `sum(v) OVER (ORDER BY …)` without the one-task global window.
    * Plan: range-partition + sort (as above), ONE job summing each
    * partition (partition-count longs to the driver, never rows),
    * broadcast the exclusive per-partition offsets, then a map adds
    * offset + local prefix. Same partitioning-independence argument
    * as globalRowNumber: a total order makes the result identical
    * for any range-boundary placement. */
  def globalRunningSum(df: DataFrame, valueCol: String, out: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd
    rdd.cache() // two passes (partition totals, then the scan) — one sort
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive offsets: partition p starts at Σ sums(0until p)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        // null contributes 0 — matches SQL sum(), which skips NULLs,
        // so the running total (declared non-nullable) stays defined
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    val res = spark.createDataFrame(outRdd, schema).localCheckpoint()
    rdd.unpersist(blocking = false)
    res
  }
}
