package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-accelerated PURE range join (no equi key). Spark plans a join
  * whose only predicate is `lo <= pt AND pt < hi` as a broadcast
  * nested loop — O(|points|·|intervals|) comparisons, the plan that
  * dies first at 100 TB. Binning restores a hash join: bucket the
  * domain at `binWidth`, explode each interval over the buckets it
  * touches (⌈len/W⌉+1 rows — bounded when interval lengths are),
  * equi-join on the bucket, then apply the exact predicate as the
  * join residual. Same rows as the naive plan (every matching
  * (point, interval) pair shares the point's bucket, which the
  * interval's explode covers; the residual kills the rest), but the
  * shuffle is O(|points| + |intervals|·bins) and the probe is hashed.
  * The reference's per-frame IoU theta join (demoTalkNet.py:402–423)
  * is the same trick with frame as the bucket; here the bucket is
  * DERIVED because no natural key exists.
  */
object RangeJoin {

  /** Join `points` (with long column `ptCol`) to `intervals` (long
    * columns `loCol`, `hiCol`; [lo, hi) half-open) on
    * `lo <= pt < hi`. All interval/point values must be nonnegative
    * (floor-div bucketing). Output: every points column + every
    * intervals column of each matching pair. */
  def binnedRangeJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // integer `div`, never `/`: double division corrupts 64-bit epoch
    // nanos (> 2^53) — the exact trap nanosecond timestamps set
    val binned = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bin",
        explode(sequence(expr(s"`$loCol` div $binWidth"),
          // hi is exclusive: the last covered bucket is (hi-1) div W
          expr(s"(`$hiCol` - 1) div $binWidth"))))
    points.withColumn("__bin", expr(s"`$ptCol` div $binWidth"))
      .join(binned, Seq("__bin"))
      .filter(col(loCol) <= col(ptCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
