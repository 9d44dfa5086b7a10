package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 pack: the remaining classic analytics shapes — graph
  * triangle counting, ordered list aggregation, per-group mode with a
  * pinned tie-break, exact least-squares trend (rational output),
  * sequential path mining, a declarative data-quality audit, a
  * higher-order-function token histogram, and exact weighted median.
  *
  * Scale contracts:
  *  - q173 counts triangles with the id-oriented wedge join (every
  *    edge/wedge keyed, hash joins only; the edge list is built once
  *    and persisted across its three references). Wedge volume is
  *    Σ outdeg² of the co-purchase graph — bounded by the ~C(4,2)
  *    pairs per order, not by |parts|².
  *  - q175/q177 put the per-key sequential logic in lead()/row_number
  *    windows partitioned by user_id — the natural partitioner; no
  *    global window exists in the pack except q177's final top-20
  *    rank over the (tiny) distinct-path aggregate.
  *  - q176 emits the regression slope as an exact cross-multiplied
  *    rational (num/den longs) — no per-row float math anywhere, so
  *    the result is partition-count independent (Q float policy).
  *  - q178 is a union of independent tiny aggregates; each FK check
  *    is a broadcast-able anti join keyed on the dimension PK.
  *  - q180's weighted median runs per-lang windows on (value, doc_id)
  *    unique order; the 2·cum ≥ tot gate is integer cross-multiply.
  */
object AnalyticsQueries extends QueryPack {
  import Q._

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** Tokens of a document — the corpus-wide convention shared with
    * q113/q153 (oracle mirror: regexp_split_to_array(trim(text), '\s+')). */
  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  val queries = Map[String, Fn](

    // TRIANGLE COUNTING over the part co-purchase graph (parts that
    // share an order are connected; triangles = cliques of mutually
    // co-purchased parts — the community-structure primitive). The
    // standard id-oriented wedge plan: undirected edges stored once
    // as u<v, wedges (x<y<z) from the self-join on the lower
    // endpoint, closed by an equi-join against the edge list itself.
    // Every join is hash (equi-keyed); per-node counts come from one
    // explode + agg. The persisted edge list is referenced three
    // times (both wedge sides + closure) — one build, ReusedExchange
    // after.
    "q173_triangle_count" -> { (s, dir) =>
      // DEGREE-ORDERED FLAT WEDGE-JOIN plan (the distributed-
      // textbook shape; round-18 rewrite). History, because each
      // predecessor's failure is the design rationale: (1) the naive
      // wedge join over un-oriented edges paid hub-degree² wedges;
      // (2) the r11 broadcast-adjacency rewrite intersected per-edge
      // OUT-arrays against broadcast out-adjacency — fast at rung 2,
      // but the broadcast HINT forces a driver-side build whatever
      // the size, and at rung 3+ the out-adjacency blew past
      // spark.driver.maxResultSize; (3) de-hinting it shuffled the
      // per-NODE arrays once per EDGE row — array duplication made
      // the exchange Σ_e d⁺ entries of serialized arrays and filled
      // the box's scratch. The plan below keeps (2)'s degree
      // orientation (max out-degree O(√m) by arboricity — hub keys
      // disappear by construction) but materializes wedges as FLAT
      // 3-long rows: oriented edges op(u→v) under the (degree, id)
      // total order, wedges from op ⋈ op on the shared lower
      // endpoint u (rank-ordered v < w), closed by ONE equi join on
      // the (v, w) edge key. Every exchange row is fixed-width;
      // shuffle volume is exactly the wedge mass Σ_u C(d⁺(u), 2) —
      // the algorithm's true cost, spilling gracefully instead of
      // dying at either memory cliff. Each triangle {a<b<c by rank}
      // is found exactly once (wedge at a, closure edge b→c) and
      // credits all three corners, so per-node totals equal the
      // undirected count. AQE broadcasts the closure side while the
      // edge list is genuinely small; past that every join shuffles
      // on equi keys — the 100 TB posture with no size cliff.
      // edge build + orientation are the shared single definitions
      // (AnalyticsQueries11.coPurchaseEdges / orientEdges — task-5
      // factoring); this query keeps its own wedge step because it
      // counts PER NODE (explode + top-100), not the global scalar
      // wedgeCountFromOp produces
      // canonical build + in-place orientation (round-16 optimization):
      // same oriented row set, half the edge rows through the distinct
      // and both degree-attach joins — see orientEdgesFromCanon. The
      // canon list is pinned only while orientation consumes it twice
      // (degrees + join side), then freed the moment op materializes
      // (the q278 eager-free discipline).
      val canon = AnalyticsQueries11.coPurchaseEdgesCanon(s, dir).persist()
      val op = AnalyticsQueries11.orientEdgesFromCanon(canon)
        .persist() // 3 references: both wedge sides + the closure key
      op.count()
      canon.unpersist()
      // shuffle-hash hints (round-16, same rationale as
      // wedgeCountFromOp): stream the wedge mass unsorted, build the
      // per-partition map from the edge list — no broadcast cliff
      val wedges = op.as("a")
        .join(op.as("b").hint("shuffle_hash"), col("a.u") === col("b.u") &&
          struct(col("a.dv"), col("a.v")) < struct(col("b.dv"), col("b.v")))
        .select(col("a.u").as("u"), col("a.v").as("v"), col("b.v").as("w"))
      val tri = wedges
        .join(op.select(col("u").as("v"), col("v").as("w")).hint("shuffle_hash"),
          Seq("v", "w"))
        .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      val out = tri.groupBy(col("node"))
        .agg(count(lit(1)).as("triangles"))
        .orderBy(col("triangles").desc, col("node"))
        .limit(100)
      out.persist().count() // pin the 100-row result, free the edge list
      op.unpersist()
      out
    },

    // ORDERED LIST AGGREGATION (listagg/string_agg): per source, the
    // sorted distinct language roster as one delimited string — the
    // catalog-summary shape. collect_set is a partial-agg (map-side
    // combine) set union; the sort happens once per group on a
    // ≤|langs| array, so the plan is a single hash aggregate.
    "q174_lang_roster" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          concat_ws(",", array_sort(collect_set(col("lang")))).as("langs"),
          countDistinct(col("lang")).as("n_langs"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    },

    // PER-GROUP MODE with pinned tie-break (most frequent event_type
    // per user; ties → lexicographically smallest type). mode() has
    // engine-defined tie behavior, so both engines run the explicit
    // two-level plan: count per (user, type), row_number over
    // (cnt DESC, type) — deterministic by construction.
    "q175_user_mode" -> { (s, dir) =>
      val c = ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))
      c.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("cnt"))
        .orderBy(col("user_id"))
    },

    // EXACT LEAST-SQUARES TREND per event_type over the daily-count
    // series (the metric-drift detector). slope = num/den with
    //   num = n·Σ(d·y) − Σd·Σy,   den = n·Σd² − (Σd)²
    // over integer epoch-days d and integer counts y — all four
    // sufficient statistics are exact long sums (associative ⇒
    // partition-independent), and the slope ships as the un-divided
    // rational so no float rounding can diverge between engines.
    // The regression itself runs on the per-(type, day) aggregate:
    // rows = types × days, tiny; the corpus-scale work is the one
    // count groupBy.
    "q176_trend_slope" -> { (s, dir) =>
      val d = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ns DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("y"))
      d.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_days"),
          // day is an epoch-day (~2e4), so n_days·sdy and sd·sy clear
          // 2^63 around 4.5e11 events per type — ALL FOUR sufficient
          // statistics widen through DECIMAL(38,0) at accumulation
          // (q201 policy; ADVICE r11: the first-order sums share the
          // same threat scale as the quadratic ones — a large-cents
          // sy would otherwise wrap as BIGINT before the later cast)
          // and the rational emits as BIGINT, valid while the true
          // numerator is under 2^63 like the oracle's HUGEINT cast.
          sum(col("day").cast("decimal(38,0)")).as("sd"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("day") * col("y")).cast("decimal(38,0)")).as("sdy"),
          sum((col("day") * col("day")).cast("decimal(38,0)")).as("sdd"))
        .select(col("event_type"), col("n_days"),
          (col("n_days") * col("sdy") -
            col("sd").cast("decimal(38,0)") * col("sy"))
            .cast("long").as("slope_num"),
          (col("n_days") * col("sdd") -
            col("sd").cast("decimal(38,0)") * col("sd"))
            .cast("long").as("slope_den"))
        .orderBy(col("event_type"))
    },

    // SEQUENTIAL PATH MINING: top-20 3-step event_type paths across
    // per-user timelines (the navigation-pattern / funnel-discovery
    // query). Two lead()s over the unique (ts_ns, event_id) per-user
    // order form the trigrams; the global top-20 rank runs on the
    // distinct-path AGGREGATE (≤ |types|³ = 125 rows), never on the
    // event stream. Tie-break pinned: (n DESC, path).
    "q177_top_paths" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val tri = ev(s, dir).select(
          col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .filter(col("b").isNotNull && col("c").isNotNull)
        .select(concat_ws(">", col("a"), col("b"), col("c")).as("path"))
      val counted = tri.groupBy(col("path")).agg(count(lit(1)).as("n"))
      counted
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("n").desc, col("path"))).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("path"), col("n"))
        .orderBy(col("rk"))
    },

    // DECLARATIVE DATA-QUALITY AUDIT: one result row per constraint
    // with its violation count — the contract-enforcement suite every
    // ingestion pipeline fronts (FK orphans via anti join on the
    // dimension PK, PK uniqueness via a having-count>1 agg, domain /
    // null / emptiness range gates as predicate counts). Each check
    // is an independent small aggregate; the union is 7 rows. A
    // green audit (all zeros) is the useful steady state — the query
    // shape, not the violation yield, is the operator.
    "q178_constraint_audit" -> { (s, dir) =>
      val orders = Tables.table(s, dir, "orders")
      val lineitem = Tables.table(s, dir, "lineitem")
      val customer = Tables.table(s, dir, "customer")
      val docs = Tables.table(s, dir, "documents")
      def check(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("constraint_name"), col("violations"))
      check("docs_text_nonempty",
          docs.filter(col("text").isNull || trim(col("text")) === ""))
        .unionByName(check("events_value_nonneg",
          ev(s, dir).filter(col("value") < 0)))
        .unionByName(check("lineitem_fk_orders",
          lineitem.join(orders, col("l_orderkey") === col("o_orderkey"),
            "left_anti")))
        .unionByName(check("lineitem_qty_domain",
          lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)))
        .unionByName(check("orders_fk_customer",
          orders.join(customer, col("o_custkey") === col("c_custkey"),
            "left_anti")))
        .unionByName(check("orders_pk_unique",
          orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)))
        .unionByName(check("docs_chars_consistent",
          docs.filter(length(col("text")) =!= col("n_chars"))))
        .orderBy(col("constraint_name"))
    },

    // TOKEN-LENGTH HISTOGRAM per language via higher-order array
    // functions: transform() maps each token to its (capped) length
    // INSIDE the array — no per-token row explosion until the final
    // explode feeds the count agg, and the cap (16+) keeps the
    // histogram domain fixed. The tokenizer is the corpus-wide
    // q113/q153 convention.
    "q179_tokenlen_hist" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("lang"),
          explode(transform(tokens(col("text")),
            t => least(length(t), lit(16)).cast("long"))).as("tok_len"))
        .groupBy(col("lang"), col("tok_len"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("tok_len"))
    },

    // EXACT WEIGHTED MEDIAN per language: the smallest n_chars value
    // v with 2·(cumulative token weight up to v) ≥ (total weight) —
    // the robust center of the length distribution under token mass.
    // Cumulative window on the unique (n_chars, doc_id) order, gate
    // integer cross-multiplied, min() collapses the qualifying
    // suffix to its first row. Windows partition by lang (parallel
    // across languages; per-lang order is the same sort the
    // quantile-normalization family already pays).
    "q180_weighted_median" -> { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("w"))
      val wl = Window.partitionBy(col("lang"))
      val cum = sum(col("w")).over(
        wl.orderBy(col("n_chars"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      d.withColumn("cum", cum)
        .withColumn("tot", sum(col("w")).over(wl))
        .filter(lit(2) * col("cum") >= col("tot"))
        .groupBy(col("lang"))
        .agg(min(col("n_chars")).as("median_chars"),
          min(col("tot")).as("total_weight"))
        .orderBy(col("lang"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q173_triangle_count" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |t AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |n AS (SELECT x AS node FROM t
        |  UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM n GROUP BY node
        |ORDER BY triangles DESC, node LIMIT 100""".stripMargin,

    "q174_lang_roster" ->
      """SELECT source,
        |  array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q175_user_mode" ->
      """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, cnt,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY cnt DESC, event_type) AS rn FROM c)
        |SELECT user_id, event_type AS mode_type, cnt
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q176_trend_slope" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, epoch_ns(ts) // 86400000000000),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(day) AS sd, sum(y) AS sy,
        |    sum(day*y) AS sdy, sum(day*day) AS sdd
        |  FROM d GROUP BY event_type)
        |SELECT event_type, n_days,
        |  CAST(n_days*sdy - sd*sy AS BIGINT) AS slope_num,
        |  CAST(n_days*sdd - sd*sd AS BIGINT) AS slope_den
        |FROM s ORDER BY event_type""".stripMargin,

    "q177_top_paths" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
        |  FROM events),
        |tri AS (SELECT event_type AS a,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
        |p AS (SELECT a || '>' || b || '>' || c AS path,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM tri WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rk,
        |    path, n FROM p)
        |SELECT rk, path, n FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,

    "q178_constraint_audit" ->
      """SELECT * FROM (
        |  SELECT 'docs_text_nonempty' AS constraint_name, CAST(count(*) AS BIGINT) AS violations
        |    FROM documents WHERE text IS NULL OR trim(text) = ''
        |  UNION ALL
        |  SELECT 'events_value_nonneg', CAST(count(*) AS BIGINT)
        |    FROM events WHERE value < 0
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', CAST(count(*) AS BIGINT)
        |    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem_qty_domain', CAST(count(*) AS BIGINT)
        |    FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        |  UNION ALL
        |  SELECT 'orders_fk_customer', CAST(count(*) AS BIGINT)
        |    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'orders_pk_unique', CAST(count(*) AS BIGINT) FROM (
        |    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'docs_chars_consistent', CAST(count(*) AS BIGINT)
        |    FROM documents WHERE length(text) <> n_chars
        |) ORDER BY constraint_name""".stripMargin,

    "q179_tokenlen_hist" ->
      """SELECT lang, CAST(tok_len AS BIGINT) AS tok_len,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT lang,
        |    unnest(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      t -> least(length(t), 16))) AS tok_len
        |  FROM documents)
        |GROUP BY lang, tok_len ORDER BY lang, tok_len""".stripMargin,

    "q180_weighted_median" ->
      """WITH d AS (SELECT lang, doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT lang, n_chars, w,
        |    sum(w) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(w) OVER (PARTITION BY lang) AS tot
        |  FROM d)
        |SELECT lang, min(n_chars) AS median_chars,
        |  CAST(min(tot) AS BIGINT) AS total_weight
        |FROM c WHERE 2*cum >= tot GROUP BY lang ORDER BY lang""".stripMargin
  )
}
