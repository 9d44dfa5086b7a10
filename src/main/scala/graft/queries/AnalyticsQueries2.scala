package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 pack, part 2: windowed sufficient-statistics (rolling
  * regression), rational diversity/concentration indices (Gini–
  * Simpson, HHI), and week-over-week deltas — the reporting-layer
  * shapes that sit on top of the q176-style exact aggregates.
  *
  * Float policy notes (Q): this pack is integer/rational end to end —
  * no floating-point op anywhere. q182 deliberately ships the
  * Gini–Simpson index instead of Shannon entropy: ln(74) itself
  * differs by 1 ulp between the JVM's and DuckDB's libm (measured),
  * so a raw transcendental output can never be hash-gated;
  * transcendentals may only rank or bucket (q85/q86/q148).
  */
object AnalyticsQueries2 extends QueryPack {
  import Q._

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  val queries = Map[String, Fn](

    // ROLLING REGRESSION: trailing-7-day least-squares slope of the
    // daily event rate, per event_type per day — q176's sufficient
    // statistics moved into a rows-window, so each day carries the
    // slope of its own trailing week (the drift monitor that pages
    // someone). All four Σ's are windowed long sums; the slope ships
    // as the exact rational (num, den). Window partitions by type →
    // |types| independent series, each tiny (the corpus-scale work
    // is the one groupBy building the daily aggregate).
    "q181_rolling_slope" -> { (s, dir) =>
      val d = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ns DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      d.select(col("event_type"), col("day"), col("y"),
          count(lit(1)).over(w).as("n"),
          sum(col("day")).over(w).as("sd"),
          sum(col("y")).over(w).as("sy"),
          sum(col("day") * col("y")).over(w).as("sdy"),
          sum(col("day") * col("day")).over(w).as("sdd"))
        .select(col("event_type"), col("day"), col("y"), col("n"),
          (col("n") * col("sdy") - col("sd") * col("sy")).as("slope_num"),
          (col("n") * col("sdd") - col("sd") * col("sd")).as("slope_den"))
        .orderBy(col("event_type"), col("day"))
    },

    // GINI–SIMPSON DIVERSITY of each user's event-type mix — the
    // behavioral diversity score, in its unbiased finite-sample form
    // D = 1 − Σ nᵢ(nᵢ−1) / (N(N−1)), shipped as the exact rational
    // (div_num, div_den): num = N(N−1) − Σ nᵢ(nᵢ−1). Integer squares
    // and sums only — Shannon entropy was prototyped here and
    // rejected because ln(74) itself differs by 1 ulp between the
    // JVM's and DuckDB's libm (observed divergence, 4/150 rows at
    // sf0.01): a raw transcendental can never be a hash-gated output
    // column (transcendentals only rank/bucket — the q85/q148 rule).
    // Two hash aggs, no window, no explode.
    "q182_user_diversity" -> { (s, dir) =>
      val c = ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      c.groupBy(col("user_id"))
        .agg(sum(col("cnt")).as("n"),
          sum(col("cnt") * (col("cnt") - 1)).as("ss"))
        .select(col("user_id"), col("n"),
          (col("n") * (col("n") - 1) - col("ss")).as("div_num"),
          (col("n") * (col("n") - 1)).as("div_den"))
        .orderBy(col("user_id"))
    },

    // HERFINDAHL–HIRSCHMAN concentration INDEX of each source's
    // language mix — the corpus-composition monopoly check (HHI → 1
    // = single-language source). HHI = Σ nᵢ² / N² emitted as the
    // exact rational (hhi_num, hhi_den longs): integer squares and
    // sums only, so the index is partition-independent and
    // hash-stable with no division anywhere.
    "q183_source_hhi" -> { (s, dir) =>
      val c = Tables.table(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
      c.groupBy(col("source"))
        // cnt² and n_docs² accumulate through DECIMAL(38,0) (the q201
        // policy: a 3e9-doc language or source would wrap the square
        // in 64-bit); the rational is emitted as BIGINT — valid while
        // the true values stay under 2^63, the bound the oracle's
        // HUGEINT path makes explicit rather than silent.
        .agg(sum(col("cnt").cast("decimal(38,0)") * col("cnt"))
          .cast("long").as("hhi_num"),
          sum(col("cnt")).as("n_docs"),
          count(lit(1)).as("n_langs"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("hhi_num"),
          (col("n_docs").cast("decimal(38,0)") * col("n_docs"))
            .cast("long").as("hhi_den"))
        .orderBy(col("source"))
    },

    // WEEK-OVER-WEEK DELTA per event_type: this week's volume vs
    // lag(1) on the weekly aggregate — the standard reporting
    // staircase. Rational growth (delta over previous) as integers;
    // first week ships 0-valued delta with prev = 0 (COALESCE pinned
    // on both engines). lag runs on the |types|×|weeks| aggregate.
    "q184_wow_delta" -> { (s, dir) =>
      val wk = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ns DIV 604800000000000").as("wk"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      wk.select(col("event_type"), col("wk"), col("n"),
          coalesce(lag(col("n"), 1).over(w), lit(0L)).as("prev_n"))
        .withColumn("delta", col("n") - col("prev_n"))
        .orderBy(col("event_type"), col("wk"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q181_rolling_slope" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day, y,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(day) OVER w AS BIGINT) AS sd,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(day*y) OVER w AS BIGINT) AS sdy,
        |    CAST(sum(day*day) OVER w AS BIGINT) AS sdd
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, y, n,
        |  n*sdy - sd*sy AS slope_num,
        |  n*sdd - sd*sd AS slope_den
        |FROM s ORDER BY event_type, day""".stripMargin,

    "q182_user_diversity" ->
      """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id, event_type),
        |g AS (SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(cnt*(cnt-1)) AS BIGINT) AS ss
        |  FROM c GROUP BY user_id)
        |SELECT user_id, n,
        |  n*(n-1) - ss AS div_num,
        |  n*(n-1) AS div_den
        |FROM g ORDER BY user_id""".stripMargin,

    "q183_source_hhi" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY source, lang)
        |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  CAST(sum(cnt*cnt) AS BIGINT) AS hhi_num,
        |  CAST(sum(cnt) AS BIGINT) * CAST(sum(cnt) AS BIGINT) AS hhi_den
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q184_wow_delta" ->
      """WITH wk AS (SELECT event_type, epoch_ns(ts) // 604800000000000 AS wk,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, wk, n,
        |    coalesce(lag(n, 1) OVER (PARTITION BY event_type ORDER BY wk),
        |      CAST(0 AS BIGINT)) AS prev_n
        |  FROM wk)
        |SELECT event_type, wk, n, prev_n, n - prev_n AS delta
        |FROM l ORDER BY event_type, wk""".stripMargin
  )
}
