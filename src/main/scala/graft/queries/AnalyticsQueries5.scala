package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 pack, part 2: U-shaped multi-touch attribution (integer
  * basis-point credit splits over the 7-day click lookback),
  * edit-distance fuzzy matching under (lang, first-token) blocking
  * (the blocked-similarity-join shape — candidates come from block
  * collisions, never the corpus cross product), a join-key skew audit
  * (the operational query a 100 TB deployment runs BEFORE choosing
  * salting/broadcast strategies), exact bitmap set-intersection over
  * a sparse word-indexed bitmap (the roaring-bitmap plan: segment
  * audiences intersect via word-aligned AND, the user set itself
  * never re-shuffles per pair), and the Spark-4 `transformWithState`
  * running-timeline processor (streaming/TwsTimeline.scala).
  */
object AnalyticsQueries5 extends QueryPack {
  import Q._

  val queries = Map[String, Fn](

    // U-SHAPED MULTI-TOUCH ATTRIBUTION: each purchase credits the
    // user's clicks in the prior 7 days — 100% to a lone click,
    // 50/50 to two, else 40% first / 40% last / 20% spread over the
    // middles (integer basis points; DIV remainder pinned to the
    // EARLIEST middle so the split stays exact). The purchase-click
    // pairing is the bounded interval join (per-user time range),
    // position/count are two windows per purchase, and the rollup
    // buckets credited revenue by the CLICK's hour — the "which hour
    // actually sells" report. credit_c = cents × bp stays ≤ ~5.6e8
    // per row; sums in BIGINT.
    "q195_multitouch" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("u"),
          col("ts_ns").as("pns"), cents(col("value")).as("rev_c"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cu"),
          col("ts_ns").as("cns"))
      val week = 7L * 86400L * 1000000000L
      val pairs = p.join(c, col("cu") === col("u") &&
        col("cns") <= col("pns") && col("cns") >= col("pns") - lit(week))
      val wOrd = Window.partitionBy(col("pid")).orderBy(col("cns"), col("cid"))
      val wAll = Window.partitionBy(col("pid"))
      val credited = pairs
        .withColumn("pos", row_number().over(wOrd).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("bp",
          when(col("m") === 1, lit(10000L))
            .when(col("m") === 2, lit(5000L))
            .when(col("pos") === 1, lit(4000L))
            .when(col("pos") === col("m"), lit(4000L))
            .otherwise(expr("2000 DIV (m - 2)") +
              when(col("pos") === 2, lit(2000L) % (col("m") - 2)).otherwise(lit(0L))))
      credited
        .withColumn("click_hour", expr("(cns DIV 3600000000000) % 24"))
        .groupBy(col("click_hour"))
        .agg(count(lit(1)).as("n_credits"),
          sum(col("bp")).as("bp_sum"),
          sum(col("rev_c") * col("bp")).as("credited_rev_cbp"))
        .orderBy(col("click_hour"))
    },

    // BLOCKED EDIT-DISTANCE MATCHING: document pairs whose 40-char
    // prefixes sit within Levenshtein 15, candidates limited to
    // (lang, first-token) block collisions — ~107 k blocked pairs at
    // sf0.1 where the cross product would be 12.5 M. Both engines
    // run the identical classic DP, so the distance is an exact
    // integer. The near-duplicate survivors come out as rows (the
    // q154 prefix-block sibling with a true edit metric).
    "q196_fuzzy_match" -> { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(col("text"), " ").getItem(0).as("t1"),
          substring(col("text"), 1, 40).as("p"))
      val a = d.select(col("doc_id").as("id_a"), col("lang"), col("t1"), col("p").as("pa"))
      val b = d.select(col("doc_id").as("id_b"), col("lang"), col("t1"), col("p").as("pb"))
      a.join(b, Seq("lang", "t1"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
        .filter(col("dist") <= 15)
        .orderBy(col("id_a"), col("id_b"))
    },

    // JOIN-KEY SKEW AUDIT: for every frequently-joined key column,
    // one row with row count, NDV, the hottest key and its share —
    // top1_ppm (hottest key's fraction, ppm) and skew_ppm (hottest ÷
    // uniform share, ppm). This is the planning query that decides
    // salting (q58), AQE skew handling, or broadcast: each column is
    // one hash agg on the key, the per-column reduce is over NDV
    // rows, and the union of five tiny audit rows is the output.
    "q197_skew_audit" -> { (s, dir) =>
      def audit(name: String, df: DataFrame, k: String): DataFrame = {
        val cnts = df.select(col(k).as("key")).groupBy(col("key"))
          .agg(count(lit(1)).as("cnt"))
        cnts.agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("ndv"),
          max_by(col("key"), struct(col("cnt"), (-col("key")).as("nk"))).as("top_key"),
          max(col("cnt")).as("top_cnt"))
          .select(lit(name).as("col_name"), col("n_rows"), col("ndv"),
            col("top_key"), col("top_cnt"),
            expr("top_cnt * 1000000 DIV n_rows").as("top1_ppm"),
            expr("top_cnt * ndv * 1000000 DIV n_rows").as("skew_ppm"))
      }
      val li = Tables.table(s, dir, "lineitem")
      audit("lineitem.l_partkey", li, "l_partkey")
        .union(audit("lineitem.l_suppkey", li, "l_suppkey"))
        .union(audit("lineitem.l_orderkey", li, "l_orderkey"))
        .union(audit("orders.o_custkey", Tables.table(s, dir, "orders"), "o_custkey"))
        .union(audit("events.user_id", Tables.events(s, dir), "user_id"))
        .orderBy(col("col_name"))
    },

    // EXACT BITMAP AUDIENCE INTERSECTION: per event type, the user
    // set as a SPARSE word-indexed bitmap (word = user DIV 32, bits =
    // OR of 1<<(user%32) — domain-proportional, no hashing, exact at
    // any scale); pairwise type overlap = popcount of word-aligned
    // AND. The bitmap build is one hash agg over events; each type
    // pair then intersects ~|users|/32 words instead of re-shuffling
    // user rows — the roaring-bitmap query shape. The same row
    // carries the expensive exact distinct-pair count, which must
    // EQUAL the popcount — a self-auditing result.
    "q198_bitmap_intersect" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val bm = ev
        .select(col("event_type"), expr("user_id DIV 32").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("mask"))
        .groupBy(col("event_type"), col("word"))
        .agg(bit_or(col("mask")).as("bits"))
        .persist()
      val inter = bm.select(col("event_type").as("ta"), col("word"), col("bits").as("ba"))
        .join(bm.select(col("event_type").as("tb"), col("word"), col("bits").as("bb")),
          Seq("word"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(sum(bit_count(col("ba").bitwiseAND(col("bb"))).cast("long")).as("n_bitmap"))
      val du = ev.distinct()
      val exact = du.select(col("event_type").as("ta"), col("user_id"))
        .join(du.select(col("event_type").as("tb"), col("user_id")), Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_exact"))
      inter.join(exact, Seq("ta", "tb"), "left")
        .select(col("ta"), col("tb"), col("n_bitmap"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy(col("ta"), col("tb"))
    },

    // TRANSFORM-WITH-STATE RUNNING TIMELINE: per-user (n, first,
    // last, max_gap, sum_cents) via Spark 4's StatefulProcessor +
    // typed ValueState on the RocksDB store, driven across two
    // time-split micro-batches so the state genuinely carries — and
    // provably drains to the batch lag()-window answer the oracle
    // computes (streaming/TwsTimeline.scala).
    "q199_tws_timeline" -> { (s, dir) =>
      graft.streaming.TwsTimeline.runningTimeline(s, dir)
    }
  )

  override def oracle: Map[String, String] = Map(

    "q195_multitouch" ->
      """WITH p AS (SELECT event_id AS pid, user_id AS u, epoch_ns(ts) AS pns,
        |    CAST(round(value*100) AS BIGINT) AS rev_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS cid, user_id AS cu, epoch_ns(ts) AS cns
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (SELECT pid, rev_c, cid, cns FROM p JOIN c ON cu = u
        |  AND cns <= pns AND cns >= pns - 604800000000000),
        |pos AS (SELECT pid, rev_c, cns,
        |    CAST(row_number() OVER (PARTITION BY pid ORDER BY cns, cid) AS BIGINT) AS pos,
        |    CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS m
        |  FROM pairs),
        |cr AS (SELECT pid, rev_c, cns,
        |    CASE WHEN m = 1 THEN 10000
        |         WHEN m = 2 THEN 5000
        |         WHEN pos = 1 THEN 4000
        |         WHEN pos = m THEN 4000
        |         ELSE 2000 // (m - 2) +
        |           CASE WHEN pos = 2 THEN 2000 % (m - 2) ELSE 0 END
        |    END AS bp
        |  FROM pos)
        |SELECT (cns // 3600000000000) % 24 AS click_hour,
        |  CAST(count(*) AS BIGINT) AS n_credits,
        |  CAST(sum(bp) AS BIGINT) AS bp_sum,
        |  CAST(sum(rev_c * bp) AS BIGINT) AS credited_rev_cbp
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    "q196_fuzzy_match" ->
      """WITH d AS (SELECT doc_id, lang, split_part(text, ' ', 1) AS t1,
        |    substr(text, 1, 40) AS p FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.lang = b.lang AND a.t1 = b.t1
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 15
        |ORDER BY id_a, id_b""".stripMargin,

    "q197_skew_audit" -> {
      def audit(name: String, table: String, k: String, keyExpr: String) =
        s"""SELECT '$name' AS col_name, n_rows, ndv, top_key, top_cnt,
          |  top_cnt * 1000000 // n_rows AS top1_ppm,
          |  top_cnt * ndv * 1000000 // n_rows AS skew_ppm
          |FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
          |    CAST(count(*) AS BIGINT) AS ndv,
          |    CAST(max(cnt) AS BIGINT) AS top_cnt,
          |    (SELECT key FROM (SELECT $keyExpr AS key, count(*) AS c
          |       FROM $table GROUP BY 1) ORDER BY c DESC, key LIMIT 1) AS top_key
          |  FROM (SELECT $keyExpr AS key, CAST(count(*) AS BIGINT) AS cnt
          |    FROM $table GROUP BY 1))""".stripMargin
      Seq(
        audit("lineitem.l_partkey", "lineitem", "k", "l_partkey"),
        audit("lineitem.l_suppkey", "lineitem", "k", "l_suppkey"),
        audit("lineitem.l_orderkey", "lineitem", "k", "l_orderkey"),
        audit("orders.o_custkey", "orders", "k", "o_custkey"),
        audit("events.user_id", "events", "k", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q198_bitmap_intersect" ->
      """WITH bm AS (SELECT event_type, user_id // 32 AS word,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
        |  FROM events GROUP BY event_type, user_id // 32),
        |inter AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS n_bitmap
        |  FROM bm a JOIN bm b ON a.word = b.word AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |ex AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS n_exact
        |  FROM du a JOIN du b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT inter.ta, inter.tb, inter.n_bitmap,
        |  coalesce(ex.n_exact, 0) AS n_exact
        |FROM inter LEFT JOIN ex ON inter.ta = ex.ta AND inter.tb = ex.tb
        |ORDER BY inter.ta, inter.tb""".stripMargin,

    "q199_tws_timeline" ->
      """WITH g AS (SELECT user_id, epoch_ns(ts) AS ns, event_id,
        |    CAST(round(value*100) AS BIGINT) AS c,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS prev
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ns) AS BIGINT) AS first_ns,
        |  CAST(max(ns) AS BIGINT) AS last_ns,
        |  CAST(coalesce(max(ns - prev), 0) AS BIGINT) AS max_gap_ns,
        |  CAST(sum(c) AS BIGINT) AS sum_c
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
