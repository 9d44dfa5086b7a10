package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 pack, part 3: co-occurrence recommendations (item-item
  * similarity with integer-scaled lift ranking), ORC source/sink
  * roundtrip (format breadth next to q54's CSV and q63's JSONL),
  * repeat-purchase interval distribution (lag on the per-customer
  * order timeline), and collocation mining by rational lift.
  *
  * Ranking floats are banned per Q policy; every score that orders a
  * window here is an INTEGER — scaled with a fixed 10⁶ multiplier
  * then integer-divided (both engines truncate toward zero on
  * nonnegative operands), with the id as the pinned tie-break.
  */
object AnalyticsQueries3 extends QueryPack {
  import Q._

  val queries = Map[String, Fn](

    // ITEM-ITEM CO-OCCURRENCE RECOMMENDATIONS: for each part, the
    // top-5 "bought together" partners ranked by scaled cosine lift
    // score = 10⁶·c²/(n_u·n_v) (c = co-orders, n = part order
    // counts). Pair generation reuses the q173 shape (per-order part
    // sets, one explode — both directions so every item sees its
    // full partner list); counts and the two frequency attachments
    // are hash aggs/joins on the item key; the top-5 is a per-item
    // row_number window (20 k tiny groups), never a global sort.
    "q185_item_similarity" -> { (s, dir) =>
      // Round-16 rewrite, results identical: ONE lineitem exchange
      // gathers each order's distinct part set (collect_set dedups
      // in-agg — the old standalone distinct exchange is gone); the
      // per-part order counts n come from exploding the same cached
      // sets (distinct (ok, pk) incidences by construction); pairs
      // expand IN-ARRAY canonically (src < dst — HALF the old
      // item≠other double-explode's rows through the pair exchange),
      // and both directions are emitted AFTER the count agg by a
      // 2-element explode (same c each way, no second final-agg pass).
      val ps = Tables.table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .select(col("ps"))
        .persist() // two readers: the n counts + the pair expansion
      val n = ps.select(explode(col("ps")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val co = ps
        .select(explode(AnalyticsQueries11.pairExplode).as("e"))
        .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
        .agg(count(lit(1)).as("c"))
        .select(explode(array(
            struct(col("src").as("item"), col("dst").as("other")),
            struct(col("dst").as("item"), col("src").as("other")))).as("p"),
          col("c"))
        .select(col("p.item").as("item"), col("p.other").as("other"), col("c"))
      // the per-part count table is CATALOG-sized (grows with SF), so
      // no broadcast hint (round-15 hint audit — the q173 cliff class):
      // both attachments are item-keyed hash joins and AQE broadcasts
      // them at runtime while the catalog is genuinely small
      val scored = co
        .join(n.select(col("pk").as("item"), col("n").as("n_item")), Seq("item"))
        .join(n.select(col("pk").as("other"), col("n").as("n_other")), Seq("other"))
        .select(col("item"), col("other"),
          expr("(1000000 * c * c) DIV (n_item * n_other)").as("score"), col("c"))
      val w = Window.partitionBy(col("item"))
        .orderBy(col("score").desc, col("other"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("item"), col("rk"), col("other"), col("c"), col("score"))
        .orderBy(col("item"), col("rk"))
    },

    // ORC ROUNDTRIP: the third on-disk format next to parquet (all
    // tables), CSV (q54) and JSONL (q63) — write the per-type daily
    // aggregate as ORC, read it back through the vectorized ORC
    // scan, and finish the rollup on the read-back (so a broken
    // writer OR reader breaks the hash). Scratch-rooted like every
    // roundtrip; the oracle computes the same answer straight from
    // the parquet source.
    "q186_orc_roundtrip" -> { (s, dir) =>
      val tmp = scratchDir(s, "graft_orc") + "/daily"
      Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_ns DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("n"), centsSum(col("value")).as("sum_c"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"),
          sum(col("sum_c")).as("sum_c"), max(col("n")).as("peak_day_n"))
        .orderBy(col("event_type"))
    },

    // REPEAT-PURCHASE INTERVAL DISTRIBUTION: lag() over each
    // customer's order timeline → whole-day gaps between consecutive
    // orders → the corpus-wide gap histogram (the replenishment-
    // cycle profile; window partitions by the natural customer key).
    // Gaps capped at 30+ to keep the histogram domain fixed.
    "q187_repurchase_gaps" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev_date").isNotNull)
        .withColumn("us_diff",
          unix_micros(col("o_orderdate").cast("timestamp")) -
            unix_micros(col("prev_date").cast("timestamp")))
        .select(least(expr("us_diff DIV 86400000000"), lit(30L)).as("gap_days"))
        .groupBy(col("gap_days"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("gap_days"))
    },

    // COLLOCATION MINING by rational lift: adjacent token bigrams
    // (array-local zip of each doc's token list — no pre-explode),
    // kept above a min support, ranked by scaled lift
    // 10⁶·c_ab·N / (c_a·c_b) — the PMI numerator without the log, so
    // the score stays integer-exact. Unigram/bigram counts are two
    // hash aggs; the two frequency attachments are joins on the
    // token key; top-50 global rank runs on the min-support SURVIVORS
    // (tiny). N (total token count) rides a 1-row broadcast — the
    // q85-style scalar shape.
    "q188_collocation_lift" -> { (s, dir) =>
      val toks = Tables.table(s, dir, "documents")
        .select(split(trim(col("text")), "\\s+").as("ts"))
        .persist()
      val uni = toks.select(explode(col("ts")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("cu"))
      val nTok = toks.select(sum(size(col("ts"))).cast("long").as("ntok"))
      val bi = toks.select(explode(
          zip_with(slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
            slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 20)
      val scored = bi
        .join(uni.select(col("t").as("a"), col("cu").as("ca")), Seq("a"))
        .join(uni.select(col("t").as("b"), col("cu").as("cb")), Seq("b"))
        .crossJoin(broadcast(nTok))
        .select(col("a"), col("b"), col("c"),
          expr("(1000000 * c * ntok) DIV (ca * cb)").as("lift"))
      // top-50 via orderBy+limit (TakeOrderedAndProject: per-partition
      // heaps → driver merge) — the survivor set is min-support-
      // bounded, not provably tiny, so the rank window must not be
      // the thing that sorts it; it runs over just the 50 kept rows
      scored
        .orderBy(col("lift").desc, col("a"), col("b")).limit(50)
        .withColumn("rk", row_number()
          .over(Window.orderBy(col("lift").desc, col("a"), col("b"))).cast("long"))
        .select(col("rk"), col("a"), col("b"), col("c"), col("lift"))
        .orderBy(col("rk"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q185_item_similarity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY pk),
        |co AS (SELECT a.pk AS item, b.pk AS other, CAST(count(*) AS BIGINT) AS c
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY a.pk, b.pk),
        |sc AS (SELECT item, other, c,
        |    (1000000 * c * c) // (ni.n * no.n) AS score
        |  FROM co JOIN n ni ON ni.pk = co.item JOIN n no ON no.pk = co.other),
        |r AS (SELECT item, other, c, score,
        |    CAST(row_number() OVER (PARTITION BY item
        |      ORDER BY score DESC, other) AS BIGINT) AS rk FROM sc)
        |SELECT item, rk, other, c, score
        |FROM r WHERE rk <= 5 ORDER BY item, rk""".stripMargin,

    // The roundtrip is identity on the aggregate; the oracle computes
    // it straight from the source table.
    "q186_orc_roundtrip" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(sum(sum_c) AS BIGINT) AS sum_c,
        |  CAST(max(n) AS BIGINT) AS peak_day_n
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q187_repurchase_gaps" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_date
        |  FROM orders)
        |SELECT least(epoch_us(o_orderdate) - epoch_us(prev_date),
        |    30*86400000000) // 86400000000 AS gap_days,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE prev_date IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q188_collocation_lift" ->
      """WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |uni AS (SELECT unnest(ts) AS t FROM d),
        |u AS (SELECT t, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY t),
        |ntok AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM uni),
        |bi0 AS (SELECT unnest(list_transform(range(1, len(ts)),
        |    bix -> struct_pack(a := ts[CAST(bix AS INT)],
        |                       b := ts[CAST(bix AS INT) + 1]))) AS p FROM d),
        |bi AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM bi0 GROUP BY 1, 2 HAVING count(*) >= 20),
        |sc AS (SELECT a, b, c,
        |    (1000000 * c * ntok.ntok) // (ua.cu * ub.cu) AS lift
        |  FROM bi JOIN u ua ON ua.t = bi.a JOIN u ub ON ub.t = bi.b, ntok),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY lift DESC, a, b) AS BIGINT) AS rk,
        |    a, b, c, lift FROM sc)
        |SELECT rk, a, b, c, lift FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin
  )
}
