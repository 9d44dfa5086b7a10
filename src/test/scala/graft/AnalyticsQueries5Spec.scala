package graft

import graft.queries.AnalyticsQueries5
import org.apache.spark.sql.functions._

/** Semantics pins for the round-12 part-2 pack: the U-shaped credit
  * split's exactness, fuzzy-match blocking and symmetry, skew-audit
  * arithmetic, bitmap-vs-exact equality, and the transformWithState
  * fold against its batch window equivalent. */
class AnalyticsQueries5Spec extends SparkSpec {

  private def run(name: String) =
    AnalyticsQueries5.queries(name)(spark, sf001)

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = graft.queries.Q.scratchDir(spark, "analytics5spec")
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q195 credit splits are exact basis points: every purchase sums to 10000") {
    // 4 clicks at hours 0,1,2,3 then one purchase → U-shape:
    // first 4000, last 4000, two middles 1000 each (2000 DIV 2, rem 0).
    val h = 3600L * 1000000L
    val dir = eventsDir(Seq(
      (1L, 0 * h, 1L, "click", 0.0), (2L, 1 * h, 1L, "click", 0.0),
      (3L, 2 * h, 1L, "click", 0.0), (4L, 3 * h, 1L, "click", 0.0),
      (5L, 4 * h, 1L, "purchase", 2.0)))
    val got = AnalyticsQueries5.queries("q195_multitouch")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 1L, 4000L, 800000L), (1L, 1L, 1000L, 200000L),
      (2L, 1L, 1000L, 200000L), (3L, 1L, 4000L, 800000L)))
  }

  test("q195 remainder goes to the earliest middle (3 middles, 2000 = 3*666 + 2)") {
    val h = 3600L * 1000000L
    val dir = eventsDir(
      (1 to 5).map(i => (i.toLong, i * h, 1L, "click", 0.0)) :+
        (9L, 6 * h, 1L, "purchase", 1.0))
    val got = AnalyticsQueries5.queries("q195_multitouch")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // hours 1..5 = positions 1..5: 4000, 668, 666, 666, 4000
    assert(got == Map(1L -> 4000L, 2L -> 668L, 3L -> 666L, 4L -> 666L, 5L -> 4000L))
    assert(got.values.sum == 10000L)
  }

  test("q196 pairs are blocked, deduped and within the distance gate") {
    val got = run("q196_fuzzy_match").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "id_a < id_b")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 15)
    }
  }

  test("q197 audit arithmetic is internally consistent") {
    val got = run("q197_skew_audit").collect()
    assert(got.map(_.getString(0)).toSeq.sorted == Seq(
      "events.user_id", "lineitem.l_orderkey", "lineitem.l_partkey",
      "lineitem.l_suppkey", "orders.o_custkey"))
    got.foreach { r =>
      val (n, ndv, topCnt, top1, skew) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(ndv <= n && topCnt <= n && topCnt >= 1)
      assert(top1 == topCnt * 1000000L / n)
      assert(skew == topCnt * ndv * 1000000L / n)
      assert(skew >= 1000000L * ndv / n, "top key is at least the uniform share")
    }
  }

  test("q198 bitmap popcount equals the exact pair intersection everywhere") {
    val got = run("q198_bitmap_intersect").collect()
    assert(got.length == 10, "5 types -> 10 unordered pairs")
    got.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"bitmap ${r.getLong(2)} != exact ${r.getLong(3)} for ${r.getString(0)}/${r.getString(1)}"))
  }

  test("q199 transformWithState fold equals the batch window computation") {
    val batch = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      graft.sources.Tables.events(spark, sf001)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          round(col("value") * 100).cast("long").as("c"))
        .withColumn("prev", lag(col("ts_ns"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts_ns")).as("first_ns"),
          max(col("ts_ns")).as("last_ns"),
          coalesce(max(col("ts_ns") - col("prev")), lit(0L)).as("max_gap_ns"),
          sum(col("c")).as("sum_c"))
        .orderBy(col("user_id"))
        .collect().map(_.toString).toSeq
    }
    val got = run("q199_tws_timeline").collect().map(_.toString).toSeq
    assert(got == batch)
  }
}
