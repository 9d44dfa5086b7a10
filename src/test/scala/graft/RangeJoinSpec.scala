package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The binned pure range join: row-identical to the naive theta join,
  * but planned as a HASH join on the derived bucket — never a nested
  * loop. Also pins the 2^53 trap: bucketing epoch-nano longs must
  * survive values double division would corrupt. */
class RangeJoinSpec extends SparkSpec {

  test("binned join returns exactly the naive range-join pairs") {
    import spark.implicits._
    val pts = (0 until 500).map(i => (i.toLong, ((i * 7919) % 3000).toLong))
      .toDF("pt_id", "v")
    // ragged intervals: widths 0 (empty), 1, up to 700 (spans 3+ bins)
    val ivs = (0 until 60).map { i =>
      val lo = ((i * 104729) % 2800).toLong
      (i.toLong, lo, lo + ((i * 13) % 701).toLong)
    }.toDF("iv_id", "lo", "hi")
    val got = RangeJoin.binnedRangeJoin(pts, "v", ivs, "lo", "hi", 250L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().sorted
    val want = pts.join(ivs, col("lo") <= col("v") && col("v") < col("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().sorted
    assert(want.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("plan is a hash/merge join on the bucket, not a nested loop") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, (i * 31 % 1000).toLong)).toDF("pt_id", "v")
    val ivs = (0 until 10).map(i => (i.toLong, i * 100L, i * 100L + 150L)).toDF("iv_id", "lo", "hi")
    val binnedPlan = RangeJoin.binnedRangeJoin(pts, "v", ivs, "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("NestedLoop"), binnedPlan)
    assert(binnedPlan.contains("HashJoin") || binnedPlan.contains("SortMergeJoin"), binnedPlan)
    // the naive plan IS the nested loop — the thing being escaped
    val naivePlan = pts.join(ivs, col("lo") <= col("v") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop"), naivePlan)
  }

  test("epoch-nano longs bucket exactly (the 2^53 double trap)") {
    import spark.implicits._
    // 1.7e18 is not representable as a double; v/W through doubles
    // would round to the wrong bucket for some of these
    val base = 1700000000000000000L
    val pts = (0 until 64).map(i => (i.toLong, base + i)).toDF("pt_id", "v")
    val ivs = Seq((0L, base, base + 32L), (1L, base + 32L, base + 64L))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.binnedRangeJoin(pts, "v", ivs, "lo", "hi", 16L)
      .groupBy(col("iv_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((0L, 32L), (1L, 32L)))
  }
}
