package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, joins, aggregations, set ops,
  * top-k — the reference's pandas/eval surface (SURVEY §2.2–§2.4,
  * §2.6; e.g. utils/get_ava_active_speaker_performance.py:81–148's
  * scan→filter→join→agg shape) re-expressed as Catalyst-planned
  * DataFrame queries.
  *
  * Scale notes: dimension tables (region/nation/part) are broadcast —
  * no shuffle of the fact side for those joins; fact↔fact joins
  * hash-partition on the join key; every aggregation is partial
  * (map-side combine) by construction. All filters/projections sit
  * directly on the parquet scan so pushdown + column pruning apply.
  */
object Relational extends QueryPack {
  import Q._

  val queries = Map[String, Fn](
    // TPC-H Q1 shape: scan → filter → groupBy → multi-agg.
    // Mirrors the reference's per-group sum/mean evals (SURVEY §2.4).
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
      li.filter($"l_shipdate" <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          centsSum($"l_quantity").as("qty_c"),
          centsSum($"l_extendedprice").as("price_c"),
          centsSum($"l_extendedprice" * (lit(1) - $"l_discount")).as("disc_c"),
          centsSum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("charge_c"),
          count(lit(1)).as("count_order"))
        .select($"l_returnflag", $"l_linestatus",
          ($"qty_c".cast("double") / 100.0).as("sum_qty"),
          ($"price_c".cast("double") / 100.0).as("sum_base_price"),
          ($"disc_c".cast("double") / 100.0).as("sum_disc_price"),
          ($"charge_c".cast("double") / 100.0).as("sum_charge"),
          ($"qty_c".cast("double") / 100.0 / $"count_order").as("avg_qty"),
          ($"price_c".cast("double") / 100.0 / $"count_order").as("avg_price"),
          $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // TPC-H Q6 shape: tight scan-side predicate (pushdown), single agg.
    "q02_filtered_revenue" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
      li.filter(
          $"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01 00:00:00").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(centsSum($"l_extendedprice" * $"l_discount").as("rev_c"),
             count(lit(1)).as("n"))
        .select(($"rev_c".cast("double") / 100.0).as("revenue"), $"n")
    },

    // Star join: facts ⋈ broadcast dims, grouped revenue per nation.
    "q03_region_revenue" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.table(s, dir, "orders")
      val cust = Tables.table(s, dir, "customer")
      val nation = Tables.table(s, dir, "nation")
      val region = Tables.table(s, dir, "region")
      orders.join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(centsSum($"o_totalprice").as("rev_c"),
             count(lit(1)).as("n_orders"),
             countDistinct($"c_custkey").as("n_customers"))
        .select($"r_name", $"n_name",
          ($"rev_c".cast("double") / 100.0).as("revenue"),
          $"n_orders", $"n_customers")
        .orderBy($"r_name", $"n_name")
    },

    // Fact ⋈ dim with dim-side predicate + grouped volume. The part
    // side is deliberately UNHINTED (round-15 hint audit): part grows
    // linearly with SF (20 G rows at 100 TB — a forced broadcast is
    // the q173 driver-build cliff), so the ENGINE picks the strategy
    // from size stats — broadcast-hash while part is genuinely small,
    // shuffle join past that (AQE re-plans at runtime from actual
    // sizes either way).
    "q04_brand_volume" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
      val part = Tables.table(s, dir, "part")
      li.join(part.filter($"p_size" >= 10), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(centsSum($"l_quantity").as("qty_c"),
             centsSum($"l_extendedprice").as("price_c"),
             count(lit(1)).as("n"))
        .select($"p_brand",
          ($"qty_c".cast("double") / 100.0).as("sum_qty"),
          ($"price_c".cast("double") / 100.0 / $"n").as("avg_price"),
          $"n")
        .orderBy($"p_brand")
    },

    // Global top-k: TakeOrderedAndProject, no full sort at scale.
    "q05_topk_orders" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },

    // Distinct (reference: pandas .unique(), utils/tools.py:112–121).
    "q06_distinct_segments" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "customer")
        .select($"c_mktsegment").distinct().orderBy($"c_mktsegment")
    },

    // Left-semi join: customers having orders (EXISTS).
    "q07_customers_with_orders" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
      val orders = Tables.table(s, dir, "orders").select($"o_custkey")
      cust.join(orders, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    },

    // Left-anti join: customers without orders, per nation (NOT EXISTS;
    // reference's set-difference shape, dataLoader.py:16).
    "q08_customers_without_orders" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
      val orders = Tables.table(s, dir, "orders").select($"o_custkey")
      val nation = Tables.table(s, dir, "nation")
      cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
        .orderBy($"n_name")
    },

    // Union + distinct + group (reference: pos∪neg label frames,
    // utils/tools.py:110–114).
    "q09_union_priority" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.table(s, dir, "orders")
      val big = orders.filter($"o_totalprice" > 300000.0)
        .select($"o_orderkey", $"o_orderpriority")
      val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderpriority")
      big.unionByName(urgent).distinct()
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },

    // EXACT per-group percentiles over integer cents (latency/value
    // distribution reporting). percentile() sorts each group in
    // executor memory — the exact baseline, sane while groups fit
    // (events keyed by type do not grow per-group without bound ONLY
    // if types stay few; at 100 TB the production variant is
    // approx_percentile with an accuracy knob — same query shape).
    // Integer inputs make the linear interpolation bit-identical to
    // DuckDB's quantile_cont (probed across group sizes: all 15
    // values matched to the bit).
    "q91_percentile_stats" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("vc", cents(col("value")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("vc")).as("min_c"), max(col("vc")).as("max_c"),
          expr("percentile(vc, 0.25)").as("p25"),
          expr("percentile(vc, 0.5)").as("p50"),
          expr("percentile(vc, 0.9)").as("p90"),
          expr("percentile(vc, 0.99)").as("p99"))
        .orderBy(col("event_type"))
    },

    // Fixed-width HISTOGRAM per group (the data-profiling /
    // distribution-report op): 20 × $20 buckets over value, top bucket
    // open-ended. Entirely integer arithmetic on cents — bucket id,
    // bounds, counts and sums are exact longs; ONE hash aggregation
    // with ≤ types×20 groups, map-side partials. (q91 is the
    // quantile view of the same distribution; this is the bucketed
    // one — the form that stays one pass at any scale.)
    "q107_value_histogram" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("vc", cents(col("value")))
        .withColumn("bucket",
          least(floor(col("vc") / 2000L), lit(19L)).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_c"))
        .select(col("event_type"), col("bucket"),
          (col("bucket") * 2000L).as("bucket_lo_c"), col("n"), col("sum_c"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // LATEST-record compaction (the CDC/upsert "current view": one row
    // per key = the most recent version; here each customer's latest
    // order by (date, key)). Done as ONE hash aggregation — max_by
    // over a lexicographic (ms, key) struct with map-side partials —
    // not a per-key sort: at 100 TB compaction is an aggregation, the
    // row_number-desc plan would sort every key's full history.
    // Dates emit as epoch millis (exact longs on both engines).
    "q106_latest_record" -> { (s, dir) =>
      // NTZ → TZ cast is identity wall-clock in the UTC session, so
      // unix_millis matches DuckDB's epoch_ms on the naive timestamp
      val ms = unix_millis(col("o_orderdate").cast("timestamp"))
      Tables.table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max_by(struct(col("o_orderkey"), ms.as("ms"),
            cents(col("o_totalprice")).as("pc"), col("o_orderstatus")),
            struct(ms, col("o_orderkey"))).as("latest"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"),
          col("latest.o_orderkey").as("latest_orderkey"),
          col("latest.ms").as("latest_order_ms"),
          col("latest.pc").as("latest_price_c"),
          col("latest.o_orderstatus").as("latest_status"),
          col("n_orders"))
        .orderBy(col("o_custkey"))
    },

    // EQUI-DEPTH histogram (q107's fixed-width sibling, the form
    // ANALYZE actually stores): ntile(20) over (value, id) — the
    // unique order keeps both engines' identical ANSI split rule
    // (first n%k buckets get ⌈n/k⌉ rows) deterministic — then one agg
    // per bucket for bounds and mass. The ntile window is global by
    // protocol; its input is (value_c, event_id) pairs only, and the
    // 100 TB variant replaces it with the q113 two-pass range
    // partitioner (same output, no single-task window).
    "q127_equidepth_histogram" -> { (s, dir) =>
      // EXACT ntile(20) without the one-task global window (the
      // round-11 global-window lint's one full-table offender): the
      // global rank comes from Enumerate.globalRowNumber (range
      // partition + sort + per-partition offsets — q90's operator),
      // and ntile's bucket is then a CLOSED FORM of (rank, n): with
      // q = n DIV 20, r = n % 20, the first r buckets hold q+1 rows —
      // bucket = (rank−1) DIV (q+1) + 1 while (rank−1) < (q+1)·r,
      // else r + ((rank−1) − (q+1)·r) DIV q + 1. Bit-identical to
      // ntile by construction (Spark assigns remainders to the first
      // buckets the same way); the q=0 branch can't divide by zero
      // because rank ≤ n = (q+1)·r there.
      val ranked = graft.operators.Enumerate.globalRowNumber(
        Tables.events(s, dir)
          .select(col("event_id"), cents(col("value")).as("vc")),
        "rk", col("vc"), col("event_id"))
      val nRow = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(nRow))
        .withColumn("bucket", expr(
          """CASE WHEN (rk - 1) < ((n DIV 20) + 1) * (n % 20)
            |  THEN (rk - 1) DIV ((n DIV 20) + 1) + 1
            |  ELSE (n % 20) + ((rk - 1) - ((n DIV 20) + 1) * (n % 20))
            |    DIV (n DIV 20) + 1 END""".stripMargin))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("vc")).as("lo_c"),
          max(col("vc")).as("hi_c"), sum(col("vc")).as("sum_c"))
        .orderBy(col("bucket"))
    },

    // SCD-2 INTERVALIZATION (the history-table build, q106's sibling:
    // that one keeps only the latest row, this one turns the change
    // log into effective [from, to) validity ranges). One partitioned
    // window per key — lead(ms) closes each version, the last stays
    // open (emitted as -1: the engines' NULL orderings differ, longs
    // don't). Shuffle on o_custkey only; version counts per key are
    // order-history-sized, so per-partition sorts stay bounded.
    "q124_scd2_intervals" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ms = unix_millis(col("o_orderdate").cast("timestamp"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("ms"), col("o_orderkey"))
      Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), ms.as("ms"),
          cents(col("o_totalprice")).as("price_c"))
        .withColumn("valid_from_ms", col("ms"))
        .withColumn("valid_to_ms",
          coalesce(lead(col("ms"), 1).over(w), lit(-1L)))
        .withColumn("is_current",
          when(col("valid_to_ms") === -1L, 1L).otherwise(0L))
        .select(col("o_custkey"), col("o_orderkey"), col("valid_from_ms"),
          col("valid_to_ms"), col("price_c"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from_ms"), col("o_orderkey"))
    },

    // ANALYZE-style COLUMN PROFILE in one statement: row count,
    // non-null counts, min/max, and EXACT ndv for four columns at
    // once. Spark plans the multi-distinct via Expand (one row
    // per distinct-column per input row) + two-level hash agg — one
    // shuffle, no per-column passes. At 100 TB swap the exact ndv for
    // approx_count_distinct (same single-statement shape, sketch
    // merge instead of Expand); the exact form here is what the
    // oracle can mirror. Dates profile as epoch millis (exact longs).
    "q122_column_profile" -> { (s, dir) =>
      val ms = unix_millis(col("l_shipdate").cast("timestamp"))
      Tables.table(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("l_partkey")).as("partkey_ndv"),
        min(col("l_partkey")).as("partkey_min"),
        max(col("l_partkey")).as("partkey_max"),
        count_distinct(col("l_suppkey")).as("suppkey_ndv"),
        count_distinct(col("l_returnflag")).as("returnflag_ndv"),
        count_distinct(col("l_linestatus")).as("linestatus_ndv"),
        min(ms).as("shipdate_min_ms"),
        max(ms).as("shipdate_max_ms"))
    },

    // Z-ORDER layout audit: Morton-interleave two 8-bit quantized
    // dims and measure, per contiguous key range (z >> 6 → 64-z-value
    // buckets), the min/max spread of BOTH dims. A z-sorted layout
    // bounds both coordinates inside every contiguous range — the
    // property that lets file-level min/max stats prune on two
    // columns at once (sort by (x, y) and the y bounds are the whole
    // domain in every x run). Pure integer bit math + one hash agg;
    // the write-side sibling is Layout.zorderBy (repartitionByRange
    // on z = the 100 TB layout step, LayoutSpec pins the bounds).
    "q118_zorder_stats" -> { (s, dir) =>
      import graft.operators.Layout
      Tables.table(s, dir, "lineitem")
        .select((col("l_partkey") % 256L).as("zx"),
          (col("l_suppkey") % 256L).as("zy"))
        .withColumn("z", Layout.zValue(col("zx"), col("zy"), bits = 8))
        .withColumn("bucket", shiftright(col("z"), 6))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("zx")).as("x_min"), max(col("zx")).as("x_max"),
          min(col("zy")).as("y_min"), max(col("zy")).as("y_max"))
        .orderBy(col("bucket"))
    },

    // Feature CORRELATION matrix in ONE pass (feature-selection /
    // drift profiling): Pearson r for all six pairs of the four
    // lineitem measures from a single aggregation of exact sufficient
    // statistics. Sums run over integer cents in DECIMAL(38,0) —
    // exact and associative, so partial aggregation commutes and the
    // result is partition-count-independent (r is scale-invariant, so
    // cents give the same r as raw units). The only doubles are the
    // FINAL casts: r = num / (sqrt(vx)·sqrt(vy)) on identical
    // expression trees both engines. Magnitudes: n·Σx² < 1e33 at
    // SF-1000 — decimal38 headroom, where a raw-double sum would long
    // have gone nondeterministic under reordering.
    "q120_corr_matrix" -> { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
        .select(cents(col("l_quantity")).as("q"),
          cents(col("l_extendedprice")).as("p"),
          cents(col("l_discount")).as("d"),
          cents(col("l_tax")).as("t"))
      def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
      val agg = li.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        dsum(col("q")).as("sq"), dsum(col("p")).as("sp"),
        dsum(col("d")).as("sd"), dsum(col("t")).as("st"),
        dsum(col("q") * col("q")).as("sqq"), dsum(col("p") * col("p")).as("spp"),
        dsum(col("d") * col("d")).as("sdd"), dsum(col("t") * col("t")).as("stt"),
        dsum(col("q") * col("p")).as("sqp"), dsum(col("q") * col("d")).as("sqd"),
        dsum(col("q") * col("t")).as("sqt"), dsum(col("p") * col("d")).as("spd"),
        dsum(col("p") * col("t")).as("spt"), dsum(col("d") * col("t")).as("sdt"))
      def r(sxy: Column, sx: Column, sy: Column, sxx: Column, syy: Column) =
        (col("n") * sxy - sx * sy).cast("double") /
          (sqrt((col("n") * sxx - sx * sx).cast("double")) *
            sqrt((col("n") * syy - sy * sy).cast("double")))
      agg
        .withColumn("r_qp", r(col("sqp"), col("sq"), col("sp"), col("sqq"), col("spp")))
        .withColumn("r_qd", r(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd")))
        .withColumn("r_qt", r(col("sqt"), col("sq"), col("st"), col("sqq"), col("stt")))
        .withColumn("r_pd", r(col("spd"), col("sp"), col("sd"), col("spp"), col("sdd")))
        .withColumn("r_pt", r(col("spt"), col("sp"), col("st"), col("spp"), col("stt")))
        .withColumn("r_dt", r(col("sdt"), col("sd"), col("st"), col("sdd"), col("stt")))
        .selectExpr("""stack(6,
          'disc_tax', r_dt, 'price_disc', r_pd, 'price_tax', r_pt,
          'qty_disc', r_qd, 'qty_price', r_qp, 'qty_tax', r_qt) AS (pair, r)""")
        .orderBy(col("pair"))
    },
  )

  val oracle = Map(
    // Mirrors q127: ANSI ntile on the same unique order.
    "q127_equidepth_histogram" ->
      """WITH e AS (SELECT event_id,
        |    CAST(round(value*100) AS BIGINT) AS vc FROM events),
        |b AS (SELECT vc, CAST(ntile(20) OVER (ORDER BY vc, event_id) AS BIGINT) AS bucket
        |  FROM e)
        |SELECT bucket, count(*) AS n,
        |  CAST(min(vc) AS BIGINT) AS lo_c, CAST(max(vc) AS BIGINT) AS hi_c,
        |  CAST(sum(vc) AS BIGINT) AS sum_c
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Mirrors q124: same window, NULL lead folded to -1 on both sides.
    "q124_scd2_intervals" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(epoch_ms(o_orderdate) AS BIGINT) AS ms,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_c
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, ms AS valid_from_ms,
        |  CAST(coalesce(lead(ms, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY ms, o_orderkey), -1) AS BIGINT) AS valid_to_ms,
        |  price_c,
        |  CAST(CASE WHEN coalesce(lead(ms, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY ms, o_orderkey), -1) = -1 THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM o
        |ORDER BY o_custkey, valid_from_ms, o_orderkey""".stripMargin,

    // Mirrors q122: NTZ shipdate → epoch_ms matches Spark's UTC-session
    // unix_millis (the q106 argument).
    "q122_column_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS partkey_ndv,
        |  CAST(min(l_partkey) AS BIGINT) AS partkey_min,
        |  CAST(max(l_partkey) AS BIGINT) AS partkey_max,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS suppkey_ndv,
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS returnflag_ndv,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS linestatus_ndv,
        |  CAST(min(epoch_ms(l_shipdate)) AS BIGINT) AS shipdate_min_ms,
        |  CAST(max(epoch_ms(l_shipdate)) AS BIGINT) AS shipdate_max_ms
        |FROM lineitem""".stripMargin,

    // Mirrors q118: the same bit-interleave arithmetic, generated from
    // one source (Layout.zValueSql); all inputs nonneg so % ≡ pmod.
    "q118_zorder_stats" -> {
      val z = graft.operators.Layout.zValueSql("zx", "zy", 8)
      s"""WITH d AS (SELECT l_partkey % 256 AS zx, l_suppkey % 256 AS zy
         |  FROM lineitem),
         |z AS (SELECT zx, zy, $z AS z FROM d)
         |SELECT CAST(z >> 6 AS BIGINT) AS bucket, count(*) AS n,
         |  CAST(min(zx) AS BIGINT) AS x_min, CAST(max(zx) AS BIGINT) AS x_max,
         |  CAST(min(zy) AS BIGINT) AS y_min, CAST(max(zy) AS BIGINT) AS y_max
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    // Mirrors q120: exact integer sufficient statistics (HUGEINT here,
    // DECIMAL(38,0) in Spark — both exact), identical final double
    // trees: CAST(num) / (sqrt(CAST(vx)) * sqrt(CAST(vy))).
    "q120_corr_matrix" -> {
      def r(name: String, sxy: String, sx: String, sy: String,
          sxx: String, syy: String) =
        s"SELECT '$name' AS pair, CAST(n*$sxy - $sx*$sy AS DOUBLE) / " +
          s"(sqrt(CAST(n*$sxx - $sx*$sx AS DOUBLE)) * " +
          s"sqrt(CAST(n*$syy - $sy*$sy AS DOUBLE))) AS r FROM s"
      s"""WITH c AS (SELECT
         |    CAST(round(l_quantity*100) AS BIGINT) AS q,
         |    CAST(round(l_extendedprice*100) AS BIGINT) AS p,
         |    CAST(round(l_discount*100) AS BIGINT) AS d,
         |    CAST(round(l_tax*100) AS BIGINT) AS t FROM lineitem),
         |s AS (SELECT count(*) AS n,
         |    sum(q) AS sq, sum(p) AS sp, sum(d) AS sd, sum(t) AS st,
         |    sum(q*q) AS sqq, sum(p*p) AS spp, sum(d*d) AS sdd, sum(t*t) AS stt,
         |    sum(q*p) AS sqp, sum(q*d) AS sqd, sum(q*t) AS sqt,
         |    sum(p*d) AS spd, sum(p*t) AS spt, sum(d*t) AS sdt FROM c)
         |SELECT pair, r FROM (
         |  ${r("qty_price", "sqp", "sq", "sp", "sqq", "spp")}
         |  UNION ALL ${r("qty_disc", "sqd", "sq", "sd", "sqq", "sdd")}
         |  UNION ALL ${r("qty_tax", "sqt", "sq", "st", "sqq", "stt")}
         |  UNION ALL ${r("price_disc", "spd", "sp", "sd", "spp", "sdd")}
         |  UNION ALL ${r("price_tax", "spt", "sp", "st", "spp", "stt")}
         |  UNION ALL ${r("disc_tax", "sdt", "sd", "st", "sdd", "stt")}
         |) ORDER BY pair""".stripMargin
    },

    // Mirrors q107: integer floor-division bucketing on cents (vc ≥ 0
    // on this data, so DuckDB's // ≡ Spark's floor(/)).
    "q107_value_histogram" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value*100) AS BIGINT) AS vc FROM events),
        |b AS (SELECT event_type, least(vc // 2000, 19) AS bucket, vc FROM e)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(bucket * 2000 AS BIGINT) AS bucket_lo_c,
        |  count(*) AS n, CAST(sum(vc) AS BIGINT) AS sum_c
        |FROM b GROUP BY event_type, b.bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // Mirrors q106: max over (epoch_ms, o_orderkey) ≡ the row_number
    // DESC/DESC pick (o_orderkey unique breaks date ties identically).
    "q106_latest_record" ->
      """WITH r AS (SELECT *, CAST(epoch_ms(o_orderdate) AS BIGINT) AS ms,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |n AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT r.o_custkey, r.o_orderkey AS latest_orderkey,
        |  r.ms AS latest_order_ms,
        |  CAST(round(r.o_totalprice*100) AS BIGINT) AS latest_price_c,
        |  r.o_orderstatus AS latest_status, n.n_orders
        |FROM r JOIN n USING (o_custkey) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q91_percentile_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_c,
        |  CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_c,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.25) AS p25,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.5) AS p50,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.9) AS p90,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.99) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q01_pricing_summary" ->
      """WITH a AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_c,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS disc_c,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS charge_c,
        |    count(*) AS count_order
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(qty_c AS DOUBLE)/100.0 AS sum_qty,
        |  CAST(price_c AS DOUBLE)/100.0 AS sum_base_price,
        |  CAST(disc_c AS DOUBLE)/100.0 AS sum_disc_price,
        |  CAST(charge_c AS DOUBLE)/100.0 AS sum_charge,
        |  CAST(qty_c AS DOUBLE)/100.0/count_order AS avg_qty,
        |  CAST(price_c AS DOUBLE)/100.0/count_order AS avg_price,
        |  count_order
        |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filtered_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q03_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
        |  count(*) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_customers
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_brand_volume" ->
      """WITH a AS (
        |  SELECT p_brand,
        |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_c,
        |    count(*) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size >= 10
        |  GROUP BY p_brand)
        |SELECT p_brand, CAST(qty_c AS DOUBLE)/100.0 AS sum_qty,
        |  CAST(price_c AS DOUBLE)/100.0/n AS avg_price, n
        |FROM a ORDER BY p_brand""".stripMargin,

    "q05_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q06_distinct_segments" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q07_customers_with_orders" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_customers_without_orders" ->
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q09_union_priority" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 300000.0
        |  UNION
        |  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderpriority, count(*) AS n FROM u
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
