package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sessionization / eval-query operators — the heart of the
  * reference's "query" semantics (SURVEY §2.5):
  *
  *  - running cumsum        (get_ava_active_speaker_performance.py:161)
  *  - sessionization        (extractSpeakingSegments.py:44–61)
  *  - score smoothing       (demoTalkNet.py:350–351)
  *  - median filter k=13    (demoTalkNet.py:190–192)
  *  - speaking segments     (extractSpeakingSegments.py:44–61, 98–99)
  *  - average precision     (get_ava_active_speaker_performance.py:57–67)
  *  - per-group F1/accuracy (demoTalkNet.py:425–437)
  *  - max-IoU theta match   (demoTalkNet.py:402–423)
  *  - linear interpolation  (demoTalkNet.py:168–175)
  *  - as-of alignment       (demoTalkNet.py:384–393, generalized)
  *
  * All windows are partitioned by `user_id` (the video/track analog),
  * so every one of these parallelizes across partitions at 100 TB —
  * the only globally-ordered window in the reference (mAP's global
  * sort) is reworked here as per-group AP, which is both what a
  * grouped corpus needs and embarrassingly parallel.
  */
object Windowed extends QueryPack {
  import Q._

  /** events + exact integer cents; ts_ns keeps ordering integer-exact. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).withColumn("value_c", cents(col("value")))
  }

  /** Oracle-side mirror of `ev`. */
  private val E =
    """e AS (SELECT event_id, user_id, event_type, props, epoch_ns(ts) AS ts_ns,
      |  CAST(round(value*100) AS BIGINT) AS value_c FROM events)""".stripMargin

  private def wUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))

  val queries = Map[String, Fn](
    // Running cumulative sum per user (the mAP query's tp.cumsum()).
    "q10_running_total" -> { (s, dir) =>
      ev(s, dir).select(col("event_id"), col("user_id"),
          (sum(col("value_c"))
            .over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / 100.0).as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Gaps-and-islands sessionization, 30-min inactivity gap.
    "q11_sessionize" -> { (s, dir) =>
      val gapNs = 1800L * 1000000000L
      val lagTs = lag(col("ts_ns"), 1).over(wUser)
      val sess = ev(s, dir)
        .withColumn("new_sess",
          when(lagTs.isNull || col("ts_ns") - lagTs > gapNs, 1L).otherwise(0L))
        .withColumn("sess_idx",
          sum(col("new_sess")).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("sess_idx"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value_c")).as("sv_c"),
             min(col("ts_ns")).as("start_ns"),
             max(col("ts_ns")).as("end_ns"))
        .select(col("user_id"), col("sess_idx"), col("n_events"),
          (col("sv_c").cast("double") / 100.0).as("session_value"),
          col("start_ns"), col("end_ns"),
          expr("(end_ns - start_ns) DIV 1000000000").as("duration_s"))
        .orderBy(col("user_id"), col("sess_idx"))
    },

    // Score smoothing: mean over rows [-2, +2] (demoTalkNet.py:350).
    // Exact: windowed long sum / windowed count.
    "q12_smooth" -> { (s, dir) =>
      val wFrame = wUser.rowsBetween(-2, 2)
      ev(s, dir).select(col("user_id"), col("event_id"),
          (sum(col("value_c")).over(wFrame).cast("double") / 100.0
            / count(lit(1)).over(wFrame)).as("smoothed"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Median filter k=13: rows [-6, +6] (scipy medfilt analog).
    // Spark disallows median() over a framed window, so take the exact
    // median of the sorted frame contents: cents are longs, so the
    // even-count interpolation (a+b)/2.0 is an exact double on both
    // engines. A 13-row frame keeps the collect tiny and codegen-able.
    "q13_median_filter" -> { (s, dir) =>
      val wFrame = wUser.rowsBetween(-6, 6)
      ev(s, dir)
        .withColumn("a", array_sort(collect_list(col("value_c")).over(wFrame)))
        .select(col("user_id"), col("event_id"),
          (expr("""CASE WHEN size(a) % 2 = 1
                   THEN CAST(element_at(a, CAST((size(a)+1) DIV 2 AS INT)) AS DOUBLE)
                   ELSE CAST(element_at(a, CAST(size(a) DIV 2 AS INT)) + element_at(a, CAST(size(a) DIV 2 + 1 AS INT)) AS DOUBLE)/2.0
                   END""") / 100.0).as("med_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Speaking-segment extraction: threshold → contiguous runs →
    // min-length filter → per-run bounds (extractSpeakingSegments.py).
    "q14_speaking_segments" -> { (s, dir) =>
      val flagged = ev(s, dir)
        .withColumn("speaking", when(col("value_c") > 3000L, 1L).otherwise(0L))
      val lagSp = lag(col("speaking"), 1).over(wUser)
      val runs = flagged
        .withColumn("changed", when(lagSp.isNull || lagSp =!= col("speaking"), 1L).otherwise(0L))
        .withColumn("grp",
          sum(col("changed")).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("speaking") === 1L)
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("ts_ns")).as("start_ns"), max(col("ts_ns")).as("end_ns"),
             count(lit(1)).as("n_events"))
        .filter(col("n_events") >= 3L)
      runs.withColumn("seg_idx",
          row_number().over(Window.partitionBy(col("user_id")).orderBy(col("start_ns"))).cast("long"))
        .select(col("user_id"), col("seg_idx"), col("start_ns"), col("end_ns"),
          col("n_events"), expr("(end_ns - start_ns) DIV 1000000000").as("duration_s"))
        .orderBy(col("user_id"), col("seg_idx"))
    },

    // VOC-style average precision per group (the AVA mAP query):
    // sort desc score → cumsum tp → precision/recall → suffix
    // running-max envelope → Σ Δrecall·precision. Runs through the
    // two-phase plan (Eval.averagePrecisionScaled): event_type has
    // only 5 distinct values, so a single-window plan caps parallelism
    // at 5 regardless of cluster size — the scaled plan partitions
    // every row-scale window by (event_type, score bucket) and
    // reassembles the identical global ranks/cumsums/envelope from
    // broadcast per-bucket offsets. Oracle unchanged (single-window
    // SQL): the two plans are bit-identical by construction, and
    // ApScaledSpec pins plain ≡ scaled on this very query.
    "q15_average_precision" -> { (s, dir) =>
      val scored = ev(s, dir)
        .withColumn("label", (col("event_id") % 2).cast("long"))
        .select(col("event_type"), col("event_id"), col("value_c"), col("label"))
      // fixed bounds skip the approxQuantile job (bounds affect only
      // balance, never the result); the empirical quantile grid of the
      // skewed value distribution — NOT an even [0,max] grid — keeps
      // the 32 buckets near-equal (value_c = cents ⇒ scale ×100)
      graft.operators.Eval
        .averagePrecisionScaled(scored, "event_type", "value_c", "label", "event_id",
          buckets = 32,
          boundsHint = Some((1 until 32).map(k => eventsValueQ64(2 * k - 1) * 100.0).toArray))
        .withColumn("contrib_n", round(col("prec_env") * col("delta_rec") * 1e9).cast("long"))
        .groupBy(col("event_type"))
        .agg((sum(col("contrib_n")).cast("double") / 1.0e9).as("ap"),
             max(col("pos")).as("n_pos"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Per-group binary-classification metrics (Columbia eval F1/ACC).
    "q16_f1_per_group" -> { (s, dir) =>
      val e = ev(s, dir)
        .withColumn("pred", when(col("value_c") > 25000L, 1L).otherwise(0L))
        .withColumn("label", (col("event_id") % 2).cast("long"))
      e.groupBy(col("event_type"))
        .agg(sum(when(col("pred") === 1L && col("label") === 1L, 1L).otherwise(0L)).as("tp"),
             sum(when(col("pred") === 1L && col("label") === 0L, 1L).otherwise(0L)).as("fp"),
             sum(when(col("pred") === 0L && col("label") === 1L, 1L).otherwise(0L)).as("fn"),
             sum(when(col("pred") === 0L && col("label") === 0L, 1L).otherwise(0L)).as("tn"))
        .select(col("event_type"), col("tp"), col("fp"), col("fn"), col("tn"),
          ((lit(2) * col("tp")).cast("double") / (lit(2) * col("tp") + col("fp") + col("fn"))).as("f1"),
          ((col("tp") + col("tn")).cast("double") / (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))
        .orderBy(col("event_type"))
    },

    // Per-frame spatial theta join on IoU > 0.3 + max-IoU pick
    // (demoTalkNet.py:402–423): GT boxes from 'view' events, predicted
    // boxes from 'click' events, frame key = user_id.
    "q17_iou_match" -> { (s, dir) =>
      def boxes(of: String, idName: String) = ev(s, dir)
        .filter(col("event_type") === of)
        .select(col("event_id").as(idName), col("user_id").as("frame"),
          (col("value") % 50).as(s"x1_$idName"),
          (col("event_id") % 40).cast("double").as(s"y1_$idName"))
        .withColumn(s"x2_$idName", col(s"x1_$idName") + 20.0)
        .withColumn(s"y2_$idName", col(s"y1_$idName") + 15.0)
      val gt = boxes("view", "gt_id")
      val pr = boxes("click", "pred_id").withColumnRenamed("frame", "frame_p")
      val joined = gt.join(pr, col("frame") === col("frame_p"))
        .withColumn("ix", greatest(lit(0.0), least(col("x2_gt_id"), col("x2_pred_id")) - greatest(col("x1_gt_id"), col("x1_pred_id"))))
        .withColumn("iy", greatest(lit(0.0), least(col("y2_gt_id"), col("y2_pred_id")) - greatest(col("y1_gt_id"), col("y1_pred_id"))))
        .withColumn("inter", col("ix") * col("iy"))
        .withColumn("iou", col("inter") / (lit(600.0) - col("inter")))
        .filter(col("iou") >= 0.3)
      joined
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("gt_id")).orderBy(col("iou").desc, col("pred_id"))))
        .filter(col("rn") === 1)
        .select(col("gt_id"), col("pred_id"), round(col("iou"), 6).as("iou_r"))
        .orderBy(col("gt_id"))
    },

    // Linear interpolation of gaps (interp1d analog): every 3rd event
    // is "observed"; the rest are linearly interpolated between the
    // nearest observed neighbors (endpoints clamp).
    "q18_interpolate" -> { (s, dir) =>
      val wPrev = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // next-non-null via REVERSED-order prefix `last` — avoids Spark's
      // O(n²) [CURRENT, UNBOUNDED FOLLOWING] frame; identical values.
      val wNextAsPrefix = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val base = ev(s, dir)
        .withColumn("pos", row_number().over(wUser).cast("long"))
        .withColumn("obs_c", when(col("event_id") % 3 === 0, col("value_c")))
        .withColumn("prev_c", last(col("obs_c"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_pos", last(when(col("obs_c").isNotNull, col("pos")), ignoreNulls = true).over(wPrev))
        .withColumn("next_c", last(col("obs_c"), ignoreNulls = true).over(wNextAsPrefix))
        .withColumn("next_pos", last(when(col("obs_c").isNotNull, col("pos")), ignoreNulls = true).over(wNextAsPrefix))
      base.withColumn("interp_c",
          when(col("obs_c").isNotNull, col("obs_c").cast("double"))
            .when(col("prev_c").isNull, col("next_c").cast("double"))
            .when(col("next_c").isNull, col("prev_c").cast("double"))
            .otherwise(col("prev_c") +
              ((col("next_c") - col("prev_c")) * (col("pos") - col("prev_pos"))).cast("double")
                / (col("next_pos") - col("prev_pos"))))
        .select(col("user_id"), col("pos"),
          when(col("obs_c").isNotNull, 1L).otherwise(0L).as("observed"),
          (col("interp_c") / 100.0).as("interp_value"))
        .orderBy(col("user_id"), col("pos"))
    },

    // As-of alignment: for each click, the most recent prior view of
    // the same user (single-pass windowed as-of — no join, no shuffle
    // beyond the user_id partitioning).
    "q19_asof_view_before_click" -> { (s, dir) =>
      val w0 = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tagged = ev(s, dir)
        .withColumn("view_id", when(col("event_type") === "view", col("event_id")))
        .withColumn("view_ts", when(col("event_type") === "view", col("ts_ns")))
        .withColumn("lv_id", last(col("view_id"), ignoreNulls = true).over(w0))
        .withColumn("lv_ts", last(col("view_ts"), ignoreNulls = true).over(w0))
      tagged.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("lv_id").as("matched_view_id"),
          (col("ts_ns") - col("lv_ts")).as("gap_ns"))
        .orderBy(col("click_id"))
    },

    // NEAREST-event as-of join (q19's bidirectional dual: q19 answers
    // "last view BEFORE each click", this answers "nearest view within
    // ±24 h, either side, ties to the earlier one"). Done the
    // scale-right way: NOT an interval join + argmin (candidate
    // expansion), but one union-sort-window pass — prev view via the
    // forward prefix `last`, next view via the REVERSED-order prefix
    // `last` (q18's trick; Spark's [CURRENT, UNBOUNDED FOLLOWING]
    // frame is O(n²) per partition). One shuffle on user_id, zero row
    // blowup, whatever the view:click ratio.
    "q104_asof_nearest" -> { (s, dir) =>
      val bound = 86400L * 1000000000L
      val wPrev = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNextAsPrefix = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tagged = ev(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .withColumn("vt", when(col("event_type") === "view", col("ts_ns")))
        .withColumn("vid", when(col("event_type") === "view", col("event_id")))
        .withColumn("pvt", last(col("vt"), ignoreNulls = true).over(wPrev))
        .withColumn("pvid", last(col("vid"), ignoreNulls = true).over(wPrev))
        .withColumn("nvt", last(col("vt"), ignoreNulls = true).over(wNextAsPrefix))
        .withColumn("nvid", last(col("vid"), ignoreNulls = true).over(wNextAsPrefix))
      tagged.filter(col("event_type") === "click")
        .withColumn("dprev", col("ts_ns") - col("pvt"))
        .withColumn("dnext", col("nvt") - col("ts_ns"))
        .withColumn("valid_p", col("pvt").isNotNull && col("dprev") <= bound)
        .withColumn("valid_n", col("nvt").isNotNull && col("dnext") <= bound)
        .withColumn("side",
          when(col("valid_p") && (!col("valid_n") || col("dprev") <= col("dnext")), "before")
            .when(col("valid_n"), "after").otherwise("none"))
        .select(col("event_id").as("click_id"), col("user_id"),
          when(col("side") === "before", col("pvid"))
            .when(col("side") === "after", col("nvid")).otherwise(-1L).as("view_id"),
          col("side"),
          when(col("side") === "before", col("dprev"))
            .when(col("side") === "after", col("dnext")).otherwise(-1L).as("dt_ns"))
        .orderBy(col("click_id"))
    },

    // Funnel / conversion attribution: within each 30-min session,
    // the ordered stage chain view → click → purchase, where each
    // stage only counts at-or-after the previous stage's first hit.
    // Three stacked unbounded window aggregates over the SAME
    // (user, session) partitioning — one shuffle, no sort (min over
    // the whole frame), each stage referencing the previous projection
    // — then one tiny rollup of sessions per deepest stage reached.
    "q82_funnel" -> { (s, dir) =>
      val gapNs = 1800L * 1000000000L
      val lagTs = lag(col("ts_ns"), 1).over(wUser)
      val sess = ev(s, dir)
        .withColumn("new_sess",
          when(lagTs.isNull || col("ts_ns") - lagTs > gapNs, 1L).otherwise(0L))
        .withColumn("sess_idx",
          sum(col("new_sess")).over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val w = Window.partitionBy(col("user_id"), col("sess_idx"))
      sess
        .withColumn("v_ts", min(when(col("event_type") === "view", col("ts_ns"))).over(w))
        .withColumn("c_ts", min(when(col("event_type") === "click" &&
          col("ts_ns") >= col("v_ts"), col("ts_ns"))).over(w))
        .withColumn("p_ts", min(when(col("event_type") === "purchase" &&
          col("ts_ns") >= col("c_ts"), col("ts_ns"))).over(w))
        .groupBy(col("user_id"), col("sess_idx"))
        .agg(max(when(col("p_ts").isNotNull, 3)
          .when(col("c_ts").isNotNull, 2)
          .when(col("v_ts").isNotNull, 1).otherwise(0)).as("stage"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("stage"))
    },

    // Interval (range) join: q19 takes only the LATEST view before
    // each click; this joins ALL views of the same user in the
    // 24-hour window before the click (inclusive; the driver events are sparse per user — minutes-wide windows almost never match). Plan: the
    // equi-key (user_id) drives a shuffled join — high-cardinality, so
    // it partitions at any scale — and the range predicate rides along
    // as a join filter; per-click aggregates keep the output one row
    // per click (left join ⇒ zero-view clicks stay, n_views = 0).
    // PURE range join (no equi key), bin-accelerated: match events to
    // overlapping value windows. q73 has user_id to hash on — here
    // NOTHING is equal on both sides, the shape Spark can only plan
    // as a broadcast nested loop (O(N·M) compares). RangeJoin derives
    // the key: bucket the domain at 250, explode each 400-wide window
    // over the 2–3 buckets it touches, hash-join on the bucket, exact
    // range as residual — same rows, O(N + 3M) shuffle instead of
    // N·M compares (RangeJoinSpec pins both the equality and the
    // no-nested-loop plan).
    "q126_binned_range_join" -> { (s, dir) =>
      val pts = ev(s, dir).select(col("event_id"), col("value_c"))
      val wins = s.range(0, 200).select(col("id").as("win_id"),
        (col("id") * 250L).as("lo"), (col("id") * 250L + 400L).as("hi"))
      graft.operators.RangeJoin.binnedRangeJoin(pts, "value_c", wins, "lo", "hi", 250L)
        .groupBy(col("win_id"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
        .orderBy(col("win_id"))
    },

    "q73_interval_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_ns").as("cts"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts_ns").as("vts"), col("value_c"))
      clicks.join(views,
          clicks("user_id") === views("user_id") &&
            col("vts") > col("cts") - lit(86400L * 1000000000L) && col("vts") <= col("cts"),
          "left")
        .groupBy(col("click_id"), clicks("user_id"))
        .agg(count(col("view_id")).as("n_views"),
          sum(coalesce(col("value_c"), lit(0L))).as("view_value_c"))
        .orderBy(col("click_id"))
    },
  )

  val oracle = Map(
    "q10_running_total" ->
      s"""WITH $E
         |SELECT event_id, user_id,
         |  CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS running_value
         |FROM e ORDER BY user_id, event_id""".stripMargin,

    "q11_sessionize" ->
      s"""WITH $E,
         |m AS (SELECT *,
         |  CASE WHEN lag(ts_ns) OVER w IS NULL
         |         OR ts_ns - lag(ts_ns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
         |g AS (SELECT *,
         |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
         |  FROM m)
         |SELECT user_id, sess_idx, count(*) AS n_events,
         |  CAST(sum(value_c) AS DOUBLE)/100.0 AS session_value,
         |  min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
         |  (max(ts_ns) - min(ts_ns)) // 1000000000 AS duration_s
         |FROM g GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin,

    "q12_smooth" ->
      s"""WITH $E
         |SELECT user_id, event_id,
         |  CAST(sum(value_c) OVER w AS DOUBLE)/100.0/count(*) OVER w AS smoothed
         |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
         |ORDER BY user_id, event_id""".stripMargin,

    "q13_median_filter" ->
      s"""WITH $E,
         |fr AS (SELECT user_id, event_id, list_sort(list(value_c) OVER w) AS a
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING))
         |SELECT user_id, event_id,
         |  (CASE WHEN len(a) % 2 = 1
         |    THEN CAST(a[(len(a)+1)//2] AS DOUBLE)
         |    ELSE CAST(a[len(a)//2] + a[len(a)//2+1] AS DOUBLE)/2.0
         |   END)/100.0 AS med_value
         |FROM fr ORDER BY user_id, event_id""".stripMargin,

    "q14_speaking_segments" ->
      s"""WITH $E,
         |f AS (SELECT *, CASE WHEN value_c > 3000 THEN 1 ELSE 0 END AS speaking FROM e),
         |c AS (SELECT *,
         |  CASE WHEN lag(speaking) OVER w IS NULL OR lag(speaking) OVER w <> speaking
         |       THEN 1 ELSE 0 END AS changed
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
         |g AS (SELECT *,
         |  CAST(sum(changed) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
         |  FROM c),
         |runs AS (SELECT user_id, grp, min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
         |    count(*) AS n_events
         |  FROM g WHERE speaking = 1 GROUP BY user_id, grp HAVING count(*) >= 3)
         |SELECT user_id,
         |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_ns) AS BIGINT) AS seg_idx,
         |  start_ns, end_ns, n_events,
         |  (end_ns - start_ns) // 1000000000 AS duration_s
         |FROM runs ORDER BY user_id, seg_idx""".stripMargin,

    "q15_average_precision" ->
      s"""WITH $E,
         |l AS (SELECT event_type, event_id, value_c,
         |        CAST(event_id % 2 AS BIGINT) AS label FROM e),
         |s AS (SELECT *,
         |  CAST(row_number() OVER w AS BIGINT) AS rn,
         |  CAST(sum(label) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         |  CAST(sum(label) OVER (PARTITION BY event_type) AS BIGINT) AS pos
         |  FROM l WINDOW w AS (PARTITION BY event_type ORDER BY value_c DESC, event_id)),
         |p AS (SELECT *, CAST(tp AS DOUBLE)/rn AS prec, CAST(tp AS DOUBLE)/pos AS rec FROM s),
         |v AS (SELECT *,
         |  max(prec) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec_env,
         |  rec - lag(rec, 1, 0.0) OVER (PARTITION BY event_type ORDER BY value_c DESC, event_id) AS delta_rec
         |  FROM p)
         |SELECT event_type,
         |  CAST(sum(CAST(round(prec_env*delta_rec*1e9) AS BIGINT)) AS DOUBLE)/1000000000.0 AS ap,
         |  CAST(max(pos) AS BIGINT) AS n_pos, count(*) AS n
         |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q16_f1_per_group" ->
      s"""WITH $E,
         |l AS (SELECT event_type,
         |        CASE WHEN value_c > 25000 THEN 1 ELSE 0 END AS pred,
         |        CAST(event_id % 2 AS BIGINT) AS label FROM e),
         |m AS (SELECT event_type,
         |  CAST(sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM l GROUP BY event_type)
         |SELECT event_type, tp, fp, fn, tn,
         |  CAST(2*tp AS DOUBLE)/(2*tp + fp + fn) AS f1,
         |  CAST(tp + tn AS DOUBLE)/(tp + fp + fn + tn) AS accuracy
         |FROM m ORDER BY event_type""".stripMargin,

    "q17_iou_match" ->
      s"""WITH $E,
         |gt AS (SELECT event_id AS gt_id, user_id AS frame,
         |         value % 50 AS x1, CAST(event_id % 40 AS DOUBLE) AS y1,
         |         value % 50 + 20.0 AS x2, CAST(event_id % 40 AS DOUBLE) + 15.0 AS y2
         |       FROM events WHERE event_type = 'view'),
         |pr AS (SELECT event_id AS pred_id, user_id AS frame,
         |         value % 50 AS x1, CAST(event_id % 40 AS DOUBLE) AS y1,
         |         value % 50 + 20.0 AS x2, CAST(event_id % 40 AS DOUBLE) + 15.0 AS y2
         |       FROM events WHERE event_type = 'click'),
         |j AS (SELECT gt_id, pred_id,
         |    greatest(CAST(0.0 AS DOUBLE), least(gt.x2, pr.x2) - greatest(gt.x1, pr.x1))
         |      * greatest(CAST(0.0 AS DOUBLE), least(gt.y2, pr.y2) - greatest(gt.y1, pr.y1)) AS inter
         |  FROM gt JOIN pr ON gt.frame = pr.frame),
         |i AS (SELECT gt_id, pred_id, inter/(600.0 - inter) AS iou FROM j
         |      WHERE inter/(600.0 - inter) >= 0.3),
         |r AS (SELECT *, row_number() OVER (PARTITION BY gt_id ORDER BY iou DESC, pred_id) AS rn FROM i)
         |SELECT gt_id, pred_id, round(iou, 6) AS iou_r FROM r WHERE rn = 1
         |ORDER BY gt_id""".stripMargin,

    "q18_interpolate" ->
      s"""WITH $E,
         |b AS (SELECT *,
         |  CAST(row_number() OVER w AS BIGINT) AS pos,
         |  CASE WHEN event_id % 3 = 0 THEN value_c END AS obs_c
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
         |n AS (SELECT *,
         |  last_value(obs_c IGNORE NULLS) OVER wp AS prev_c,
         |  last_value(CASE WHEN obs_c IS NOT NULL THEN pos END IGNORE NULLS) OVER wp AS prev_pos,
         |  first_value(obs_c IGNORE NULLS) OVER wn AS next_c,
         |  first_value(CASE WHEN obs_c IS NOT NULL THEN pos END IGNORE NULLS) OVER wn AS next_pos
         |  FROM b WINDOW
         |    wp AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, pos,
         |  CAST(CASE WHEN obs_c IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed,
         |  (CASE WHEN obs_c IS NOT NULL THEN CAST(obs_c AS DOUBLE)
         |        WHEN prev_c IS NULL THEN CAST(next_c AS DOUBLE)
         |        WHEN next_c IS NULL THEN CAST(prev_c AS DOUBLE)
         |        ELSE prev_c + CAST((next_c - prev_c)*(pos - prev_pos) AS DOUBLE)/(next_pos - prev_pos)
         |   END)/100.0 AS interp_value
         |FROM n ORDER BY user_id, pos""".stripMargin,

    "q19_asof_view_before_click" ->
      s"""WITH $E,
         |t AS (SELECT *,
         |  last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS) OVER w AS lv_id,
         |  last_value(CASE WHEN event_type = 'view' THEN ts_ns END IGNORE NULLS) OVER w AS lv_ts
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT event_id AS click_id, user_id, lv_id AS matched_view_id,
         |  ts_ns - lv_ts AS gap_ns
         |FROM t WHERE event_type = 'click' ORDER BY click_id""".stripMargin,

    // Mirrors q104: forward prefix last for the prev view, REVERSED
    // prefix last for the next view (≡ the Spark plan's two window
    // passes incl. tie-breaks), same CASE order for side/view_id/dt.
    "q104_asof_nearest" ->
      s"""WITH $E,
         |u AS (SELECT user_id, event_id, event_type, ts_ns,
         |    CASE WHEN event_type = 'view' THEN ts_ns END AS vt,
         |    CASE WHEN event_type = 'view' THEN event_id END AS vid
         |  FROM e WHERE event_type IN ('view', 'click')),
         |t AS (SELECT *,
         |    last_value(vt IGNORE NULLS) OVER wf AS pvt,
         |    last_value(vid IGNORE NULLS) OVER wf AS pvid,
         |    last_value(vt IGNORE NULLS) OVER wr AS nvt,
         |    last_value(vid IGNORE NULLS) OVER wr AS nvid
         |  FROM u
         |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts_ns, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wr AS (PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |c AS (SELECT user_id, event_id AS click_id,
         |    ts_ns - pvt AS dprev, nvt - ts_ns AS dnext, pvid, nvid,
         |    (pvt IS NOT NULL AND ts_ns - pvt <= 86400000000000) AS valid_p,
         |    (nvt IS NOT NULL AND nvt - ts_ns <= 86400000000000) AS valid_n
         |  FROM t WHERE event_type = 'click'),
         |f AS (SELECT *, CASE
         |    WHEN valid_p AND (NOT valid_n OR dprev <= dnext) THEN 'before'
         |    WHEN valid_n THEN 'after' ELSE 'none' END AS side
         |  FROM c)
         |SELECT click_id, user_id,
         |  CASE side WHEN 'before' THEN pvid WHEN 'after' THEN nvid
         |    ELSE -1 END AS view_id,
         |  side,
         |  CASE side WHEN 'before' THEN dprev WHEN 'after' THEN dnext
         |    ELSE -1 END AS dt_ns
         |FROM f ORDER BY click_id""".stripMargin,

    "q82_funnel" ->
      s"""WITH $E,
         |m AS (SELECT *, CASE WHEN lag(ts_ns) OVER w IS NULL
         |         OR ts_ns - lag(ts_ns) OVER w > 1800000000000
         |       THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
         |s2 AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx FROM m),
         |f1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ns END)
         |    OVER (PARTITION BY user_id, sess_idx) AS v_ts FROM s2),
         |f2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_ns >= v_ts THEN ts_ns END)
         |    OVER (PARTITION BY user_id, sess_idx) AS c_ts FROM f1),
         |f3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_ns >= c_ts THEN ts_ns END)
         |    OVER (PARTITION BY user_id, sess_idx) AS p_ts FROM f2),
         |g AS (SELECT user_id, sess_idx,
         |    max(CASE WHEN p_ts IS NOT NULL THEN 3 WHEN c_ts IS NOT NULL THEN 2
         |             WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS stage
         |  FROM f3 GROUP BY 1, 2)
         |SELECT CAST(stage AS INT) AS stage, count(*) AS n_sessions
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors q126 with the NAIVE range join — binning is plan-only,
    // the rows must be identical.
    "q126_binned_range_join" ->
      s"""WITH $E,
         |w AS (SELECT i AS win_id, i*250 AS lo, i*250 + 400 AS hi
         |      FROM range(0, 200) t(i))
         |SELECT w.win_id, CAST(w.lo AS BIGINT) AS lo, CAST(w.hi AS BIGINT) AS hi,
         |  count(*) AS n, CAST(sum(e.value_c) AS BIGINT) AS sum_c
         |FROM w JOIN e ON w.lo <= e.value_c AND e.value_c < w.hi
         |GROUP BY 1, 2, 3
         |ORDER BY win_id""".stripMargin,

    "q73_interval_join" ->
      s"""WITH $E,
         |c AS (SELECT user_id, event_id AS click_id, ts_ns AS cts
         |      FROM e WHERE event_type = 'click'),
         |v AS (SELECT user_id, event_id AS view_id, ts_ns AS vts, value_c
         |      FROM e WHERE event_type = 'view')
         |SELECT c.click_id, c.user_id, count(v.view_id) AS n_views,
         |  CAST(sum(coalesce(v.value_c, 0)) AS BIGINT) AS view_value_c
         |FROM c LEFT JOIN v
         |  ON v.user_id = c.user_id
         | AND v.vts > c.cts - 86400000000000 AND v.vts <= c.cts
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
  )
}
