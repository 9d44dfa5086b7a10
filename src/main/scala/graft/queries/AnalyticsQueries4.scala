package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 pack: interval algebra (coalesce overlapping activity
  * windows — the islands-and-gaps plan), exponentially-decayed user
  * activity features as exact rationals (the convolution form of EWMA,
  * no recursion and no floats), multi-hop BFS reachability by
  * frontier-join unrolling (the distributed min-distance shape that
  * scales where a recursive driver loop cannot), closed-form OLS via a
  * distributed Gram matrix + exact BigInt Cramer solve (normal
  * equations: ONE aggregation pass over any row count, O(k²) driver
  * state), and a linear-counting distinct sketch audited against the
  * exact count (bitmap OR + popcount — the mergeable-sketch shape).
  *
  * Float policy as everywhere in the query layer: every value that
  * orders, gates, or hashes is an integer (cents, epoch-ns, scaled
  * rationals); coefficients that are genuinely rational are emitted as
  * exact numerator/denominator decimal strings, never divided.
  */
object AnalyticsQueries4 extends QueryPack {
  import Q._

  /** Activity interval length: 8 h in nanoseconds (the corpus
    * median inter-event gap is ~7.3 h, so roughly half of adjacent
    * windows merge — islands are real merges, not singletons). */
  private val SpanNs = 28800L * 1000000000L

  val queries = Map[String, Fn](

    // INTERVAL COALESCE (islands and gaps): each event opens an 8 h
    // activity window [ts, ts+8h); overlapping/touching windows per
    // user merge into islands. prev-running-max-end over a 1-row-
    // lagged unbounded frame detects island starts; a running sum of
    // the start flags numbers the islands — two window passes over
    // the SAME (user, ts, id) sort order, so one shuffle and one sort
    // serve both. Per-user rollup: island count, total covered ns,
    // longest island. All epoch-ns integer math; ordering pinned by
    // (ts_ns, event_id).
    "q189_interval_coalesce" -> { (s, dir) =>
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("b"), col("event_id"))
      val prevMax = max(col("e")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1))
      val islands = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ns").as("b"),
          (col("ts_ns") + lit(SpanNs)).as("e"))
        .withColumn("fresh",
          when(prevMax.isNull || col("b") > prevMax, lit(1L)).otherwise(lit(0L)))
        .withColumn("island",
          sum(col("fresh")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("b")).as("ib"), max(col("e")).as("ie"))
      islands.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie") - col("ib")).as("covered_ns"),
          max(col("ie") - col("ib")).as("longest_ns"))
        .orderBy(col("user_id"))
    },

    // DECAYED ACTIVITY FEATURE (EWMA, exact): per user, the α=1/2
    // exponentially-weighted mean of the last K=8 event values at the
    // user's LATEST event, as an exact rational — numerator
    // Σ cents·2^(K-1-j), denominator Σ 2^(K-1-j) over the j=0..7 most
    // recent events. The recursive EWMA definition is hostile to both
    // engines (order-dependent float folds); the bounded-window
    // convolution form is not: each event emits K weighted
    // contributions to the rows ahead of it (a constant-factor
    // explode, partition-local), a hash agg sums them per target row,
    // and only the per-user LAST row is kept. Integer-exact on both
    // engines regardless of summation order.
    "q190_decay_profile" -> { (s, dir) =>
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val base = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ns"),
          cents(col("value")).as("c"))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .persist()
      val last = base.groupBy(col("user_id"))
        .agg(max(col("rn")).as("rn"), count(lit(1)).as("n_events"))
      val contrib = base
        .select(col("user_id"), col("rn"), col("c"),
          explode(sequence(lit(0), lit(7))).as("j"))
        .select(col("user_id"), (col("rn") + col("j")).as("rn"),
          (col("c") * expr("shiftleft(CAST(1 AS BIGINT), CAST(7 - j AS INT))")).as("wc"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(7 - j AS INT))").as("w"))
        .groupBy(col("user_id"), col("rn"))
        .agg(sum(col("wc")).as("num"), sum(col("w")).as("den"))
      contrib.join(last, Seq("user_id", "rn"))
        .select(col("user_id"), col("n_events"), col("num"), col("den"))
        .orderBy(col("user_id"))
    },

    // BFS REACHABILITY, 3 hops unrolled: the co-purchase item graph
    // (parts sharing an order, co-count ≥ 2 so hub orders don't
    // quadratically blow the edge list) walked breadth-first from a
    // deterministic seed set (pk ≡ 0 mod 100). Each hop is one
    // distinct frontier-edge hash join — the frontier stays a set of
    // ids, the edge list never moves, and min-distance falls out of
    // the FIRST hop that reaches a node (union + min agg). This is
    // the scale shape for k-hop queries: k joins, no driver loop
    // state beyond the plan itself. Output: distance histogram with a
    // key-sum checksum per level.
    "q191_bfs_hops" -> { (s, dir) =>
      // Edge build = the shared array-local canonical-pair helper
      // (AnalyticsQueries11.coPurchaseEdgesMinSupport — ONE lineitem
      // shuffle, in-array pair expansion, co-count ≥ 2, mirrored
      // after the ~300× HAVING shrink; rung-2 measurement in
      // ARCHITECTURE.md).
      val edges = AnalyticsQueries11.coPurchaseEdgesMinSupport(s, dir)
        .persist()
      val seeds = Tables.table(s, dir, "part")
        .select(col("p_partkey").as("node"))
        .filter(col("node") % 100 === 0)
      def hop(frontier: DataFrame): DataFrame =
        frontier.join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node")).distinct()
      val d0 = seeds.withColumn("dist", lit(0L))
      val d1 = hop(seeds).withColumn("dist", lit(1L))
      val d2 = hop(d1.select(col("node"))).withColumn("dist", lit(2L))
      val d3 = hop(d2.select(col("node"))).withColumn("dist", lit(3L))
      d0.union(d1).union(d2).union(d3)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("key_sum"))
        .orderBy(col("dist"))
    },

    // OLS BY NORMAL EQUATIONS: fit cents(value) ~ 1 + hour + dow on
    // events with a single distributed aggregation building the exact
    // integer Gram matrix XᵀX and moment vector Xᵀy, then an EXACT
    // BigInt Cramer solve of the 3×3 system on the driver (the
    // collect is ONE row of 10 longs — O(k²) for k features, row
    // count irrelevant; this is how linear models fit on 100 TB).
    // Coefficients are genuinely rational, so they are emitted as
    // det-numerator/determinant decimal STRINGS (sign normalized to a
    // positive denominator) — exact on any engine, no division
    // convention to agree on.
    "q192_ols_normal" -> { (s, dir) =>
      val g = Tables.events(s, dir)
        .select(cents(col("value")).as("y"),
          hour(col("ts")).cast("long").as("x1"),
          (dayofweek(col("ts")) - 1).cast("long").as("x2"))
        // Moment sums widen through DECIMAL(38,0) (q201 policy):
        // Σ x1·y reaches ~2.3e8·N, so BIGINT wraps silently around
        // 4e10 events — far below a 100 TB event log. Per-row
        // products are long-safe (≤ 23·cents); only the accumulation
        // needs width, and the driver-side Cramer solve is BigInt
        // exact either way.
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x1").cast("decimal(38,0)")).as("s1"),
          sum(col("x2").cast("decimal(38,0)")).as("s2"),
          sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
          sum((col("x1") * col("x2")).cast("decimal(38,0)")).as("s12"),
          sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("s22"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
          sum((col("x2") * col("y")).cast("decimal(38,0)")).as("s2y"))
        .collect()(0) // bounded: one row of nine decimals (the Gram matrix)
      val Seq(n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
        (0 until 9).map(i => BigInt(g.getDecimal(i).toBigIntegerExact))
      // G = [[n s1 s2][s1 s11 s12][s2 s12 s22]], b = [sy s1y s2y]
      def det3(a: Seq[BigInt]): BigInt =
        a(0) * (a(4) * a(8) - a(5) * a(7)) -
          a(1) * (a(3) * a(8) - a(5) * a(6)) +
          a(2) * (a(3) * a(7) - a(4) * a(6))
      val gm = Seq(n, s1, s2, s1, s11, s12, s2, s12, s22)
      val d = det3(gm)
      def repl(col: Int): BigInt = det3(gm.zipWithIndex.map { case (v, i) =>
        if (i % 3 == col) Seq(sy, s1y, s2y)(i / 3) else v })
      val sgn = d.signum
      val rows = Seq("intercept", "hour", "dow").zipWithIndex.map { case (f, i) =>
        (f, (repl(i) * sgn).toString, (d * sgn).toString) }
      s.createDataFrame(rows).toDF("coef", "num", "den").orderBy(col("coef"))
    },

    // STREAMING LEFT-OUTER INTERVAL JOIN: clicks against same-user
    // views in the preceding hour, with UNMATCHED clicks emitted on
    // watermark passage — the outer-join surface q76's inner join
    // cannot express, driven to a deterministic drained answer by the
    // sentinel-advanced watermark (see EventStream.outerJoinRollup).
    // The oracle is the plain batch LEFT JOIN the stream provably
    // converges to.
    "q193_stream_outer" -> { (s, dir) =>
      graft.streaming.EventStream.outerJoinRollup(s, dir)
    },

    // LINEAR-COUNTING DISTINCT SKETCH, audited: per event type,
    // distinct users estimated by a 16384-bit bitmap (bit index =
    // universal hash of user_id, the q49/q117 oracled hash family) —
    // materialized as 512 OR-able 32-bit words (bit 63 is unreachable
    // by design: DuckDB range-checks BIGINT left shifts, so the word
    // width that is safe on BOTH engines is < 64 bits), the exact shape a mergeable
    // per-partition sketch has at scale (map-side bit_or, then a
    // ≤512-row-per-group reduce; the raw user set never shuffles).
    // Output keeps integers only — set-bit count and hit-word count —
    // next to the exact distinct count computed the expensive way, so
    // the row is simultaneously the sketch AND its accuracy audit
    // (the q105 estimate-vs-exact pattern).
    "q194_linear_counting" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val sketch = ev
        .select(col("event_type"),
          expr(s"($posSql94 % 16384) DIV 32").as("word"),
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(($posSql94 % 16384) % 32 AS INT))")
            .as("mask"))
        .groupBy(col("event_type"), col("word"))
        .agg(bit_or(col("mask")).as("bits"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("words_hit"),
          sum(bit_count(col("bits")).cast("long")).as("bits_set"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      sketch.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("bits_set"), col("words_hit"))
        .orderBy(col("event_type"))
    }
  )

  /** Spark-SQL text of the q194 hash position (mirrors the Column
    * form; kept as one string so mask and word provably share it). */
  private val posSql94: String = {
    val (ha, hb) = graft.operators.Dedup.affine(19400)
    s"pmod($ha * pmod(user_id, 4294967291) + $hb, 4294967291)"
  }

  override def oracle: Map[String, String] = Map(

    "q189_interval_coalesce" ->
      s"""WITH iv AS (SELECT user_id, event_id, epoch_ns(ts) AS b,
        |    epoch_ns(ts) + ${SpanNs} AS e FROM events),
        |m AS (SELECT user_id, event_id, b, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY b, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv),
        |f AS (SELECT user_id, event_id, b, e,
        |    CASE WHEN pm IS NULL OR b > pm THEN 1 ELSE 0 END AS fresh
        |  FROM m),
        |isl AS (SELECT user_id, b, e,
        |    sum(fresh) OVER (PARTITION BY user_id ORDER BY b, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |g AS (SELECT user_id, island, min(b) AS ib, max(e) AS ie
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(ie - ib) AS BIGINT) AS covered_ns,
        |  CAST(max(ie - ib) AS BIGINT) AS longest_ns
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q190_decay_profile" ->
      """WITH base AS (SELECT user_id, event_id,
        |    CAST(round(value*100) AS BIGINT) AS c,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS BIGINT) AS rn
        |  FROM events),
        |last AS (SELECT user_id, max(rn) AS rn,
        |    CAST(count(*) AS BIGINT) AS n_events FROM base GROUP BY user_id),
        |contrib AS (SELECT user_id, rn + j AS rn,
        |    sum(c * (CAST(1 AS BIGINT) << CAST(7 - j AS INT))) AS num,
        |    sum(CAST(1 AS BIGINT) << CAST(7 - j AS INT)) AS den
        |  FROM base, (SELECT unnest(range(0, 8)) AS j)
        |  GROUP BY user_id, rn + j)
        |SELECT b.user_id, last.n_events,
        |  CAST(b.num AS BIGINT) AS num, CAST(b.den AS BIGINT) AS den
        |FROM contrib b JOIN last ON b.user_id = last.user_id AND b.rn = last.rn
        |ORDER BY b.user_id""".stripMargin,

    "q191_bfs_hops" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (SELECT a.pk AS src, b.pk AS dst
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= 2),
        |d0 AS (SELECT p_partkey AS node FROM part WHERE p_partkey % 100 = 0),
        |d1 AS (SELECT DISTINCT e.dst AS node FROM d0 JOIN edges e ON e.src = d0.node),
        |d2 AS (SELECT DISTINCT e.dst AS node FROM d1 JOIN edges e ON e.src = d1.node),
        |d3 AS (SELECT DISTINCT e.dst AS node FROM d2 JOIN edges e ON e.src = d2.node),
        |u AS (SELECT node, 0 AS dist FROM d0
        |  UNION ALL SELECT node, 1 FROM d1
        |  UNION ALL SELECT node, 2 FROM d2
        |  UNION ALL SELECT node, 3 FROM d3),
        |md AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM u GROUP BY node)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(node) AS BIGINT) AS key_sum
        |FROM md GROUP BY dist ORDER BY dist""".stripMargin,

    // HUGEINT keeps every product exact (≤ ~1e30 at sf1, well inside
    // int128); the same integer Gram sums feed the same Cramer
    // polynomial the Scala BigInt solve evaluates.
    "q192_ols_normal" ->
      """WITH g AS (SELECT
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
        |    CAST(sum(x1*x1) AS HUGEINT) AS s11, CAST(sum(x1*x2) AS HUGEINT) AS s12,
        |    CAST(sum(x2*x2) AS HUGEINT) AS s22,
        |    CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(x1*y) AS HUGEINT) AS s1y,
        |    CAST(sum(x2*y) AS HUGEINT) AS s2y
        |  FROM (SELECT CAST(round(value*100) AS BIGINT) AS y,
        |      CAST(hour(ts) AS BIGINT) AS x1,
        |      CAST(dayofweek(ts) AS BIGINT) AS x2
        |    FROM events)),
        |dets AS (SELECT
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS d,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS d0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS d1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS d2
        |  FROM g),
        |sgn AS (SELECT CASE WHEN d < 0 THEN -1 ELSE 1 END AS s FROM dets)
        |SELECT coef, CAST(num*s AS VARCHAR) AS num, CAST(den*s AS VARCHAR) AS den
        |FROM (SELECT 'intercept' AS coef, d0 AS num, d AS den FROM dets
        |  UNION ALL SELECT 'hour', d1, d FROM dets
        |  UNION ALL SELECT 'dow', d2, d FROM dets), sgn
        |ORDER BY coef""".stripMargin,

    "q193_stream_outer" ->
      """WITH c AS (SELECT event_id AS cid, user_id AS u, epoch_ns(ts) AS cns
        |    FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS vid, user_id AS u, epoch_ns(ts) AS vns,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.u, c.cid, v.vid, v.vc
        |  FROM c LEFT JOIN v ON v.u = c.u AND v.vns <= c.cns
        |    AND v.vns >= c.cns - 3600000000000)
        |SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(vid) AS BIGINT) AS n_matched,
        |  CAST(count(DISTINCT cid) AS BIGINT) AS n_clicks,
        |  CAST(coalesce(sum(vc), 0) AS BIGINT) AS matched_value_c
        |FROM j GROUP BY u ORDER BY u""".stripMargin,

    "q194_linear_counting" -> {
      val pos = s"(${Q.uhashSql("19400", "(user_id % 4294967291)")} % 16384)"
      s"""WITH sk AS (SELECT event_type, $pos // 32 AS word,
        |    bit_or(CAST(1 AS BIGINT) << CAST($pos % 32 AS INT)) AS bits
        |  FROM events GROUP BY event_type, $pos // 32),
        |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS words_hit,
        |    CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set
        |  FROM sk GROUP BY event_type),
        |ex AS (SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY event_type)
        |SELECT agg.event_type, ex.n_exact, agg.bits_set, agg.words_hit
        |FROM agg JOIN ex ON agg.event_type = ex.event_type
        |ORDER BY agg.event_type""".stripMargin
    }
  )
}
