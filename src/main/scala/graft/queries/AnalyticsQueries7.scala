package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 pack, part 4: temporal ANTI join computed by the
  * union-sort plan (one partition-local sort instead of a pair join —
  * the shape that survives hub users), and leaderboard churn between
  * the two halves of the order history (rank-movement analytics where
  * every window runs on the aggregate, never the fact table).
  */
object AnalyticsQueries7 extends QueryPack {
  import Q._

  val queries = Map[String, Fn](

    // TEMPORAL ANTI JOIN: views with NO click in the following hour,
    // per user — the "unanswered impression" feed. The naive plan
    // pair-joins views×clicks then anti-filters; this one UNIONS the
    // two row kinds into one per-user timeline, sorts once, and reads
    // each view's NEXT click time off a following-rows window frame —
    // no join, no pair blowup on hub users, one shuffle+sort per
    // user. Same-timestamp clicks sort BEFORE views (kind rank), so
    // the frame's min is exactly min{click ts > view ts}; the anti
    // condition is then a per-row comparison. Oracle: the textbook
    // correlated NOT EXISTS.
    "q211_temporal_antijoin" -> { (s, dir) =>
      val hourNs = 3600L * 1000000000L
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type").as("kind"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kr"),
          cents(col("value")).as("c"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("kr"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      ev.withColumn("next_click_ns",
          min(when(col("kind") === "click", col("ts_ns"))).over(w))
        .filter(col("kind") === "view")
        .withColumn("unanswered",
          when(col("next_click_ns").isNull ||
            col("next_click_ns") > col("ts_ns") + lit(hourNs), lit(1L))
            .otherwise(lit(0L)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"),
          sum(col("unanswered")).as("n_unanswered"),
          sum(col("unanswered") * col("c")).as("unanswered_value_c"))
        .orderBy(col("user_id"))
    },

    // LEADERBOARD CHURN: the revenue top-10 parts in the first vs
    // second half of the order history, with rank movement. The fact
    // join (lineitem⋈orders for the date) and the half split are one
    // hash join + one hash agg; BOTH rank windows run over the 2×
    // per-part aggregate — a global window, but on the part rollup,
    // never the fact stream (documented: |parts| rows, and a
    // two-phase bucketed rank would take over at catalog scale).
    "q212_leaderboard_churn" -> { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("ok"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      val Array(lo, hi) = o.agg(min(col("ous")), max(col("ous")))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray // 1-row scalar
      val b = lo + (hi - lo) / 2
      val rev = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
          cents(col("l_extendedprice")).as("rc"))
        .join(o, Seq("ok"))
        .withColumn("h", when(col("ous") < b, lit(0L)).otherwise(lit(1L)))
        .groupBy(col("pk"), col("h"))
        .agg(sum(col("rc")).as("rev_c"))
      val ranked = rev.withColumn("rk", row_number().over(
          Window.partitionBy(col("h"))
            .orderBy(col("rev_c").desc, col("pk"))).cast("long"))
        .filter(col("rk") <= 10)
      val r1 = ranked.filter(col("h") === 0)
        .select(col("pk"), col("rk").as("rank_first"), col("rev_c").as("rev_first_c"))
      val r2 = ranked.filter(col("h") === 1)
        .select(col("pk"), col("rk").as("rank_second"), col("rev_c").as("rev_second_c"))
      r1.join(r2, Seq("pk"), "fullOuter")
        .select(col("pk"),
          coalesce(col("rank_first"), lit(0L)).as("rank_first"),
          coalesce(col("rank_second"), lit(0L)).as("rank_second"),
          coalesce(col("rev_first_c"), lit(0L)).as("rev_first_c"),
          coalesce(col("rev_second_c"), lit(0L)).as("rev_second_c"))
        .orderBy(col("pk"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q211_temporal_antijoin" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) AS ns, event_id,
        |    CAST(round(value*100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'view'),
        |ck AS (SELECT user_id, epoch_ns(ts) AS ns
        |  FROM events WHERE event_type = 'click'),
        |m AS (SELECT v.user_id, v.c,
        |    CASE WHEN NOT EXISTS (SELECT 1 FROM ck
        |        WHERE ck.user_id = v.user_id AND ck.ns > v.ns
        |          AND ck.ns <= v.ns + 3600000000000)
        |      THEN 1 ELSE 0 END AS unanswered
        |  FROM v)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(sum(unanswered) AS BIGINT) AS n_unanswered,
        |  CAST(sum(unanswered * c) AS BIGINT) AS unanswered_value_c
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q212_leaderboard_churn" ->
      """WITH o AS (SELECT o_orderkey AS ok, epoch_us(o_orderdate::TIMESTAMP) AS ous
        |    FROM orders),
        |bd AS (SELECT min(ous) + (max(ous) - min(ous)) // 2 AS b FROM o),
        |rev AS (SELECT l_partkey AS pk,
        |    CASE WHEN o.ous < bd.b THEN 0 ELSE 1 END AS h,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN o ON o.ok = lineitem.l_orderkey, bd
        |  GROUP BY 1, 2),
        |rk AS (SELECT pk, h, rev_c,
        |    CAST(row_number() OVER (PARTITION BY h
        |      ORDER BY rev_c DESC, pk) AS BIGINT) AS rk
        |  FROM rev QUALIFY rk <= 10),
        |r1 AS (SELECT pk, rk AS rank_first, rev_c AS rev_first_c FROM rk WHERE h = 0),
        |r2 AS (SELECT pk, rk AS rank_second, rev_c AS rev_second_c FROM rk WHERE h = 1)
        |SELECT coalesce(r1.pk, r2.pk) AS pk,
        |  coalesce(r1.rank_first, 0) AS rank_first,
        |  coalesce(r2.rank_second, 0) AS rank_second,
        |  coalesce(r1.rev_first_c, 0) AS rev_first_c,
        |  coalesce(r2.rev_second_c, 0) AS rev_second_c
        |FROM r1 FULL OUTER JOIN r2 ON r1.pk = r2.pk
        |ORDER BY pk""".stripMargin
  )
}
