package graft

import graft.queries.AnalyticsQueries7
import org.apache.spark.sql.functions._

/** Semantics pins for q211/q212: the union-sort anti join against the
  * naive pair-join plan, and leaderboard invariants. */
class AnalyticsQueries7Spec extends SparkSpec {

  test("q211 union-sort plan equals the naive anti-join plan") {
    val hourNs = 3600L * 1000000000L
    val ev = graft.sources.Tables.events(spark, sf001)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("u"), col("ts_ns").as("vns"),
        round(col("value") * 100).cast("long").as("c"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_ns").as("cns"))
    val naive = v.join(c, col("cu") === col("u") && col("cns") > col("vns") &&
        col("cns") <= col("vns") + lit(hourNs), "left_anti")
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_unanswered"), sum(col("c")).as("unanswered_value_c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = AnalyticsQueries7.queries("q211_temporal_antijoin")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    got.foreach { case (u, n, vc) =>
      val (en, evc) = naive.getOrElse(u, (0L, 0L))
      assert(n == en && vc == evc, s"user $u: got ($n,$vc) expected ($en,$evc)")
    }
    // totals also agree (users absent from naive have zero unanswered)
    assert(got.map(_._2).sum == naive.values.map(_._1).sum)
  }

  test("q211 plans no join at all — one window over the unioned timeline") {
    val plan = AnalyticsQueries7.queries("q211_temporal_antijoin")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "the union-sort plan must not join")
    assert(plan.contains("Window"))
  }

  test("q213 chi-square identity holds and arms partition the users") {
    val r = AnalyticsQueries7.queries("q213_ab_test")(spark, sf001).collect()(0)
    val (nC, cvC, nT, cvT) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nUsers = graft.sources.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(nC + nT == nUsers)
    assert(cvC <= nC && cvT <= nT)
    val (a, b, c, d) = (BigInt(cvT), BigInt(nT - cvT), BigInt(cvC), BigInt(nC - cvC))
    assert(BigInt(r.getString(4)) == (a + b + c + d) * (a * d - b * c).pow(2))
    assert(BigInt(r.getString(5)) == (a + b) * (c + d) * (a + c) * (b + d))
    val sig = if (BigInt(r.getString(4)) * 100 > BigInt(r.getString(5)) * 384) 1L else 0L
    assert(r.getLong(6) == sig)
  }

  test("q214 order statistics bracket correctly and the funnel is sequential") {
    val got = AnalyticsQueries7.queries("q214_funnel_latency")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == Seq("click_to_purchase", "view_to_click"))
    got.foreach { case (_, n, lo, hi, p90) =>
      assert(n > 0 && lo > 0 && hi >= lo && p90 >= hi)
    }
    val Some((_, nV2C, _, _, _)) = got.find(_._1 == "view_to_click")
    val Some((_, nC2P, _, _, _)) = got.find(_._1 == "click_to_purchase")
    assert(nC2P <= nV2C, "each funnel stage can only lose users")
  }

  test("q215 restart-recovered stream equals the batch aggregate") {
    import graft.sources.Tables
    val batch = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
      .orderBy(col("event_type"))
      .collect().map(_.toString).toSeq
    val got = AnalyticsQueries7.queries("q215_stream_resume")(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(got == batch)
  }

  test("q216 weighted sums are consistent: num/den bound the per-user cents range") {
    val got = AnalyticsQueries7.queries("q216_twap")(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, num, den) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && den > 0 && num >= 0)
      // TWAP lies within [0, max cents]: num <= den * maxCents bound
      assert(num <= den * 100000L)
    }
    // truncated whole-second gaps: per user, the summed holding time
    // is ≤ the span and loses < 1 s per gap to truncation
    import graft.sources.Tables
    val spans = Tables.events(spark, sf001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        ((max(col("ts_ns")) - min(col("ts_ns"))) / lit(1000000000L)).cast("long").as("span"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { r =>
      val (u, d) = (r.getLong(0), r.getLong(3))
      val (n, span) = spans(u)
      assert(d <= span + 1, s"user $u holding time $d exceeds span $span")
      assert(d >= span - n, s"user $u lost more than 1 s per gap")
    }
  }

  test("q217 merged session count equals the full recompute for every user") {
    val got = AnalyticsQueries7.queries("q217_incremental_sessions")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (u, full, merged, bridged) =>
      assert(full == merged, s"user $u: merged $merged != full $full")
      assert(bridged == 0L || bridged == 1L)
    }
    // the bridge case, exercised on a constructed corpus: user 1's
    // events straddle the midpoint 10 min apart (one session that the
    // split cuts in two — must re-merge); user 2's straddle 2 h apart
    // (two genuine sessions — must NOT merge)
    import spark.implicits._
    val m = 60L * 1000000L
    val dir = graft.queries.Q.scratchDir(spark, "analytics7s")
    Seq(
      (1L, 0L, 1L), (2L, 55 * m, 1L), (3L, 65 * m, 1L),
      (4L, 120 * m, 1L),
      (5L, 0L, 2L), (6L, 0L, 2L), (7L, 120 * m, 2L))
      .toDF("event_id", "us", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // global midpoint = 60 min: user 1 has events at 55' and 65' (gap
    // 10' — bridges), user 2 at 0' and 120' (gap 2 h — no bridge)
    val small = AnalyticsQueries7.queries("q217_incremental_sessions")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(small.toSeq == Seq((1L, 3L, 3L, 1L), (2L, 2L, 2L, 0L)))
  }

  test("q218 folds partition users and the leakage audit row is zero") {
    val got = AnalyticsQueries7.queries("q218_group_kfold")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val audit = got.find(_._1 == -1L).get
    assert(audit._2 == 0L, "group k-fold must never split a user across folds")
    val folds = got.filter(_._1 >= 0)
    assert(folds.map(_._1).sorted.toSeq == (0L to 4L))
    val nUsers = graft.sources.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(folds.map(_._2).sum == nUsers)
    val nEvents = spark.read.parquet(s"$sf001/events.parquet").count()
    assert(folds.map(_._3).sum == nEvents)
  }

  test("q219 lateness is bounded by the hourly batch model and buckets tile events") {
    val got = AnalyticsQueries7.queries("q219_lateness_profile")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nEvents = spark.read.parquet(s"$sf001/events.parquet").count()
    assert(got.map(_._2).sum == nEvents)
    // intra-batch reordering can never exceed the batch width
    got.foreach { case (bucket, _, maxLate) =>
      assert(maxLate < 3600L * 1000000000L)
      assert(bucket >= 0 && bucket <= 3, "bucket 4 (≥1h) is impossible by construction")
    }
    assert(got.exists(t => t._1 > 0 && t._2 > 0), "profile must be non-degenerate")
  }

  test("q212 ranks are 1..10 per half and revenue orders them") {
    val got = AnalyticsQueries7.queries("q212_leaderboard_churn")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val firsts = got.filter(_._2 > 0)
    val seconds = got.filter(_._3 > 0)
    assert(firsts.map(_._2).sorted.toSeq == (1L to 10L))
    assert(seconds.map(_._3).sorted.toSeq == (1L to 10L))
    // rank 1 has the max revenue within its half
    assert(firsts.maxBy(_._4)._2 == 1L)
    assert(seconds.maxBy(_._5)._3 == 1L)
  }
}
