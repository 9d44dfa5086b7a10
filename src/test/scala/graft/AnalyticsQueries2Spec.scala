package graft

import graft.queries.{AnalyticsQueries, AnalyticsQueries2}
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 part-2 pack: the rolling slope
  * agrees with the global q176 slope on a series shorter than its
  * window, diversity hits its exact extremes, and the WoW staircase
  * telescopes back to the weekly totals. */
class AnalyticsQueries2Spec extends SparkSpec {

  private def run(name: String) =
    AnalyticsQueries2.queries(name)(spark, sf001)

  test("q181 last-row trailing slope equals q176 global slope on a short series") {
    import spark.implicits._
    // A 3-day series (inside one trailing-7 window): the final day's
    // rolling rational must equal q176's global one — d=0,1,2 with
    // y=1,2,4 ⇒ num 9, den 6 (cross-multiplied compare).
    val day = 86400L * 1000000L
    val rows = for {
      (d, y) <- Seq((0L, 1), (1L, 2), (2L, 4)); i <- 0 until y
    } yield (d * 10 + i, new java.sql.Timestamp((d * day + i) / 1000L),
      1L, "click", 1.0, "{}")
    val dir = graft.queries.Q.scratchDir(spark, "analytics2spec")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val global = AnalyticsQueries.queries("q176_trend_slope")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val lastRow = AnalyticsQueries2.queries("q181_rolling_slope")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      .maxBy(_._2)
    val (gn, gd) = global("click")
    assert((gn, gd) == (9L, 6L))
    assert(lastRow._3 * gd == gn * lastRow._4,
      s"rolling ${lastRow._3}/${lastRow._4} vs global $gn/$gd")
  }

  test("q182 diversity extremes are exact") {
    import spark.implicits._
    // user 1: 4 events all one type → D = 0 (num 0); user 2: two
    // types 1+1 → D = 1 (num == den).
    val rows = Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "a"), (4L, 1L, "a"),
      (5L, 2L, "a"), (6L, 2L, "b")
    ).map { case (e, u, t) =>
      (e, new java.sql.Timestamp(e * 1000L), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.queries.Q.scratchDir(spark, "analytics2spec")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries2.queries("q182_user_diversity")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 4L, 0L, 12L), (2L, 2L, 2L, 2L)))
  }

  test("q183 HHI of a single-language source is num == den") {
    val rows = run("q183_source_hhi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((src, nDocs, nLangs, num, den) <- rows) {
      assert(den == nDocs * nDocs)
      if (nLangs == 1) assert(num == den, s"$src")
      else assert(num < den && num * nLangs >= den, s"$src Cauchy-Schwarz floor")
    }
  }

  test("q184 deltas telescope to the weekly totals") {
    val rows = run("q184_wow_delta").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((t, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      assert(sorted.head._4 == 0L, s"$t first prev_n")
      assert(sorted.map(_._5).sum == sorted.last._3, s"$t telescoping")
      sorted.sliding(2).foreach {
        case Array((_, _, n1, _, _), (_, _, _, p2, _)) => assert(n1 == p2)
        case _ =>
      }
    }
  }
}
