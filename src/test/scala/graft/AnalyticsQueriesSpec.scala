package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 pack beyond the oracle gate:
  * triangle closure on a constructed graph (the wedge join counts
  * exactly the closed wedges, once each), mode/path tie-break
  * determinism, exact-rational slope on a hand-computable series,
  * the weighted-median gate at the exact 50% boundary, and partition
  * independence of the integer plans. */
class AnalyticsQueriesSpec extends SparkSpec {

  private def run(name: String) =
    AnalyticsQueries.queries(name)(spark, sf001)

  test("q173 counts each triangle exactly once on a constructed graph") {
    import spark.implicits._
    // Orders as hyperedges: order 1 = {10,20,30} (one triangle),
    // order 2 = {20,30,40} (second triangle sharing edge 20-30),
    // order 3 = {10,50} (an edge in no triangle). Expected per-node
    // triangle counts: 20,30 → 2; 10,40 → 1; 50 → 0 (absent).
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 30L), (2L, 40L),
      (3L, 10L), (3L, 50L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = graft.queries.Q.scratchDir(spark, "analyticsspec")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = AnalyticsQueries.queries("q173_triangle_count")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(20L -> 2L, 30L -> 2L, 10L -> 1L, 40L -> 1L))
  }

  test("q175 mode tie-break picks the lexicographically smallest type") {
    val m = run("q175_user_mode").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // Recompute per-user counts independently and check the pinned
    // (cnt DESC, type ASC) choice for every user.
    val counts = graft.sources.Tables.events(spark, sf001)
      .groupBy(col("user_id"), col("event_type")).count()
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    for ((u, rows) <- counts) {
      val want = rows.map(t => (t._2, t._3)).minBy { case (ty, c) => (-c, ty) }
      assert(m(u) == want, s"user $u: got ${m(u)}, want $want")
    }
  }

  test("q176 slope rational matches a hand-computed series") {
    import spark.implicits._
    // One type, three days d=0,1,2 with counts y=1,2,4 (built as
    // that many events inside each day). n=3, Σd=3, Σy=7, Σdy=10,
    // Σd²=5 ⇒ num = 3·10−3·7 = 9, den = 3·5−9 = 6 (slope 1.5).
    val day = 86400L * 1000000L // µs per day
    val rows = for {
      (d, y) <- Seq((0L, 1), (1L, 2), (2L, 4))
      i <- 0 until y
    } yield (d * 10 + i, new java.sql.Timestamp((d * day + i) / 1000L),
      1L, "click", 1.0, "{}")
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.queries.Q.scratchDir(spark, "analyticsspec")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.queries("q176_trend_slope")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("click", 3L, 9L, 6L)))
  }

  test("q177 rank is dense-unique and deterministic") {
    val rows = run("q177_top_paths").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // counts non-increasing; ties broken by path ascending
    rows.sliding(2).foreach {
      case Array((_, p1, n1), (_, p2, n2)) =>
        assert(n1 > n2 || (n1 == n2 && p1 < p2))
      case _ =>
    }
  }

  test("q178 audit is all-green on the generated tables") {
    val audit = run("q178_constraint_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit.size == 7)
    assert(audit.values.forall(_ == 0L), audit.toString)
  }

  test("q180 weighted median sits at the exact 2·cum >= tot boundary") {
    import spark.implicits._
    // Weights 1,1,2 on values 10,20,30: tot=4, cum(10)=1, cum(20)=2
    // ⇒ 2·2 >= 4 fires AT v=20 (the exact-half boundary), not 30.
    // One-token docs weigh 1; "a b" weighs 2.
    val docs = Seq(
      (1L, "x", "en", 10L), (2L, "y", "en", 20L), (3L, "a b", "en", 30L)
    ).toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("source", lit("s"))
    val dir = graft.queries.Q.scratchDir(spark, "analyticsspec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AnalyticsQueries.queries("q180_weighted_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("en", 20L, 4L)))
  }

  test("q173/q176 are partition-count independent") {
    for (name <- Seq("q173_triangle_count", "q176_trend_slope")) {
      val base = run(name).collect().map(_.toString).toSeq
      for (p <- Seq("7", "13")) {
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", p)
        try assert(run(name).collect().map(_.toString).toSeq == base,
          s"$name drifts at partitions=$p")
        finally spark.conf.set("spark.sql.shuffle.partitions", old)
      }
    }
  }
}
