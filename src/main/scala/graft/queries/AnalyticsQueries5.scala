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

  val queries: Map[String, Fn] = Map(

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
          // the per-row product stays ≤ ~5.6e8, but the per-hour SUM
          // clears 2^63 around 1.6e10 credits/hour — so it accumulates
          // through DECIMAL(38,0) (q201 policy) and emits BIGINT,
          // valid while the true total is under 2^63 like the
          // oracle's HUGEINT→BIGINT cast.
          sum(col("rev_c").cast("decimal(38,0)") * col("bp"))
            .cast("long").as("credited_rev_cbp"))
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
        // threshold form = banded DP with early abandon (returns −1
        // above the bound): per-pair cost O(40·15) instead of O(40²)
        // — measured 1.33× on the sf1 scale-ladder (290 s → 218 s
        // over its 10.9 M candidate pairs). Same rows as the
        // oracle's unbounded levenshtein ≤ 15.
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pa"), col("pb"), 15).cast("long").as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 15)
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
            // Products widen through DECIMAL(38,0) so they cannot wrap
            // at large sf (top_cnt·ndv·1e6 can pass 2^63 long before the
            // QUOTIENTS do: top1_ppm ≤ 1e6 and skew_ppm ≤ ndv·1e6, both
            // BIGINT-safe at any plausible scale). DuckDB widens the
            // same way through HUGEINT.
            expr("CAST(CAST(top_cnt AS DECIMAL(38,0)) * 1000000 DIV n_rows AS BIGINT)")
              .as("top1_ppm"),
            expr("CAST(CAST(top_cnt AS DECIMAL(38,0)) * ndv * 1000000 DIV n_rows AS BIGINT)")
              .as("skew_ppm"))
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

    // ENTITY-RESOLUTION CLUSTERS: the q196 fuzzy-match pairs become
    // an edge list and min-label connected components (the q72
    // operator — per-round localCheckpoint loop on the edge-connected
    // subgraph only) resolve transitive matches into entities; output
    // is the per-cluster rollup for clusters of ≥ 2 documents. The
    // oracle re-derives the same components with a recursive CTE —
    // feasible exactly because blocking keeps the edge list tiny,
    // which is also why the Spark loop converges in a few rounds.
    "q200_fuzzy_clusters" -> { (s, dir) =>
      val edges = queries("q196_fuzzy_match")(s, dir)
        .select(col("id_a"), col("id_b"))
      val nodes = Tables.table(s, dir, "documents")
        .select(col("doc_id").as("id"))
      graft.operators.Components.connectedComponents(nodes, edges)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_docs"), sum(col("id")).as("id_sum"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("comp"))
    },

    // JOIN-CARDINALITY ESTIMATION: |A ⋈ A| on a key = Σ cnt(k)² — the
    // number that predicts pair-explosion cost before you run a
    // self-join (q185/q191/q196 all needed it). Exact value next to a
    // deterministic 1/64 key-sample estimate (keys whose universal
    // hash ≡ 0 mod 64, scaled ×64) — the sketch a planner consults
    // when the exact pass is itself too expensive. Per column: one
    // hash agg builds the key histogram; both numbers reduce from it.
    "q201_join_cardinality" -> { (s, dir) =>
      val (ha, hb) = graft.operators.Dedup.affine(20100)
      def card(name: String, df: DataFrame, k: String): DataFrame =
        df.select(col(k).as("key")).groupBy(col("key"))
          .agg(count(lit(1)).as("cnt"))
          // cnt² accumulates through DECIMAL(38,0) (a 3e9-row hot key
          // would wrap cnt² in 64-bit); the final counts are emitted as
          // BIGINT — valid while Σcnt² < 2^63, i.e. until a single key
          // carries ~3e9 rows, the same bound the oracle's HUGEINT path
          // makes explicit rather than silent.
          .agg(sum(col("cnt").cast("decimal(38,0)") * col("cnt"))
            .cast("long").as("exact_pairs"),
            sum(when(pmod(lit(ha) * pmod(col("key"), lit(4294967291L)) + lit(hb),
                lit(4294967291L)) % 64 === 0,
                col("cnt").cast("decimal(38,0)") * col("cnt"))
              .otherwise(lit(0L)) * 64).cast("long").as("est_pairs"),
            count(when(pmod(lit(ha) * pmod(col("key"), lit(4294967291L)) + lit(hb),
              lit(4294967291L)) % 64 === 0, lit(1))).as("n_sampled"))
          .select(lit(name).as("col_name"), col("exact_pairs"),
            col("est_pairs"), col("n_sampled"))
      val li = Tables.table(s, dir, "lineitem")
      card("lineitem.l_partkey", li, "l_partkey")
        .union(card("lineitem.l_suppkey", li, "l_suppkey"))
        .union(card("orders.o_custkey", Tables.table(s, dir, "orders"), "o_custkey"))
        .union(card("events.user_id", Tables.events(s, dir), "user_id"))
        .orderBy(col("col_name"))
    },

    // INCREMENTAL VIEW MAINTENANCE: the per-type rollup (count, cents
    // sum, distinct users) maintained as state ⊕ delta — the base
    // half of the corpus is the "stored" aggregate, the second half
    // the arriving delta, and the merge is purely algebraic: counts
    // and sums add, the distinct-user count merges through the q198
    // sparse bitmap (bit_or is the mergeable form distinct-count
    // lacks). Each output row carries the incrementally-merged AND
    // the fully-recomputed value side by side — equal by construction,
    // which is exactly what the oracle pins. This is the production
    // shape at 100 TB: never re-scan history, fold the delta in.
    "q202_ivm_rollup" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("ts_ns"),
          cents(col("value")).as("c"))
      val Array(lo, hi) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray // 1-row scalar
      val b = lo + (hi - lo) / 2
      def bitmap(df: DataFrame): DataFrame = df
        .select(col("event_type"), expr("user_id DIV 32").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("mask"))
        .groupBy(col("event_type"), col("word"))
        .agg(bit_or(col("mask")).as("bits"))
      def scalars(df: DataFrame): DataFrame = df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
      val base = ev.filter(col("ts_ns") < b).persist()
      val delta = ev.filter(col("ts_ns") >= b).persist()
      // merge: scalar halves add; bitmap halves re-OR per word
      val mergedScalars = scalars(base).union(scalars(delta))
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_merged"), sum(col("sum_c")).as("sum_merged"))
      val mergedNdv = bitmap(base).union(bitmap(delta))
        .groupBy(col("event_type"), col("word"))
        .agg(bit_or(col("bits")).as("bits"))
        .groupBy(col("event_type"))
        .agg(sum(bit_count(col("bits")).cast("long")).as("ndv_merged"))
      val full = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_full"), sum(col("c")).as("sum_full"),
          countDistinct(col("user_id")).as("ndv_full"))
      mergedScalars.join(mergedNdv, Seq("event_type"))
        .join(full, Seq("event_type"))
        .select(col("event_type"), col("n_merged"), col("n_full"),
          col("sum_merged"), col("sum_full"), col("ndv_merged"), col("ndv_full"))
        .orderBy(col("event_type"))
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
          |  CAST(CAST(top_cnt AS HUGEINT) * 1000000 // n_rows AS BIGINT) AS top1_ppm,
          |  CAST(CAST(top_cnt AS HUGEINT) * ndv * 1000000 // n_rows AS BIGINT) AS skew_ppm
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

    // The recursive label propagation enumerates (node, reachable
    // label) pairs — bounded and fast precisely because blocking kept
    // the edge list tiny; min per node is the same component label
    // the Spark min-label loop converges to.
    "q200_fuzzy_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, split_part(text, ' ', 1) AS t1,
        |    substr(text, 1, 40) AS p FROM documents),
        |e0 AS (SELECT a.doc_id AS ia, b.doc_id AS ib
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.t1 = b.t1
        |    AND a.doc_id < b.doc_id
        |  WHERE levenshtein(a.p, b.p) <= 15),
        |e AS (SELECT ia AS a, ib AS b FROM e0
        |  UNION ALL SELECT ib, ia FROM e0),
        |r AS (SELECT DISTINCT a AS node, a AS label FROM e
        |  UNION
        |  SELECT e.b, r.label FROM r JOIN e ON e.a = r.node),
        |lab AS (SELECT node, min(label) AS comp FROM r GROUP BY node)
        |SELECT comp, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(node) AS BIGINT) AS id_sum
        |FROM lab GROUP BY comp HAVING count(*) >= 2 ORDER BY comp""".stripMargin,

    "q201_join_cardinality" -> {
      val uh = Q.uhashSql("20100", "(key % 4294967291)")
      def card(name: String, table: String, keyExpr: String) =
        s"""SELECT '$name' AS col_name,
          |  CAST(sum(CAST(cnt AS HUGEINT)*cnt) AS BIGINT) AS exact_pairs,
          |  CAST(sum(CASE WHEN $uh % 64 = 0 THEN CAST(cnt AS HUGEINT)*cnt*64 ELSE 0 END) AS BIGINT)
          |    AS est_pairs,
          |  CAST(count(CASE WHEN $uh % 64 = 0 THEN 1 END) AS BIGINT) AS n_sampled
          |FROM (SELECT $keyExpr AS key, CAST(count(*) AS BIGINT) AS cnt
          |  FROM $table GROUP BY 1)""".stripMargin
      Seq(
        card("lineitem.l_partkey", "lineitem", "l_partkey"),
        card("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        card("orders.o_custkey", "orders", "o_custkey"),
        card("events.user_id", "events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q202_ivm_rollup" ->
      """WITH b AS (SELECT min(epoch_ns(ts)) +
        |    (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS bd FROM events),
        |e AS (SELECT event_type, user_id, epoch_ns(ts) AS ns,
        |    CAST(round(value*100) AS BIGINT) AS c FROM events),
        |half AS (SELECT e.*, CASE WHEN ns < bd THEN 0 ELSE 1 END AS h FROM e, b),
        |sc AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s FROM half GROUP BY 1, 2),
        |ms AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_merged,
        |    CAST(sum(s) AS BIGINT) AS sum_merged FROM sc GROUP BY 1),
        |bm AS (SELECT event_type, h, user_id // 32 AS w,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
        |  FROM half GROUP BY 1, 2, 3),
        |mb AS (SELECT event_type, w, bit_or(bits) AS bits FROM bm GROUP BY 1, 2),
        |mn AS (SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT) AS ndv_merged
        |  FROM mb GROUP BY 1),
        |f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_full,
        |    CAST(sum(c) AS BIGINT) AS sum_full,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_full
        |  FROM e GROUP BY 1)
        |SELECT ms.event_type, ms.n_merged, f.n_full, ms.sum_merged, f.sum_full,
        |  mn.ndv_merged, f.ndv_full
        |FROM ms JOIN mn ON ms.event_type = mn.event_type
        |  JOIN f ON ms.event_type = f.event_type
        |ORDER BY ms.event_type""".stripMargin,

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
