package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rounds 12–13, pack 4: temporal ANTI join by the union-sort plan
  * (one partition-local sort instead of a pair join — the shape that
  * survives hub users); leaderboard churn (rank windows on the
  * aggregate, never the fact table); the exact chi-square A/B readout
  * (BigInt on the driver, integer cross-multiplied verdict);
  * checkpointed stream resume; exact TWAP rationals; funnel stage
  * latency by exact order statistics; incremental sessionization with
  * the O(1)-per-user boundary-session merge. Round-13 additions: the
  * audited HLL (q224) and KMV/theta (q228) sketches, small-file
  * compaction (q226), snapshot diff (q229), Benford digit audit
  * (q230), peak-concurrency sweep line (q231), consistent-hashing
  * reshard audit (q232), largest-remainder quota allocation (q233),
  * exact Gini (q234), Spearman via the scale-safe enumerator (q235),
  * and the linear-interpolation grid resample (q236).
  */
object AnalyticsQueries7 extends QueryPack {
  import Q._

  /** q224's rank-of-first-one ladder: rho(w) = 25 − bitlength(w) for
    * a 24-bit w (HLL's leading-zero rank), as a CASE ladder of integer
    * comparisons — shared verbatim by both engines, so no engine's
    * log2/float rounding can disagree at the power-of-two boundaries. */
  private def rhoCase(wExpr: String): String =
    (1 to 24).map(r => s"WHEN ($wExpr) >= ${1L << (24 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 25 END")

  val queries = Map[String, Fn](

    // HYPERLOGLOG REGISTER SKETCH, audited: the 256-register HLL over
    // events.user_id — reg = h mod 256, rho = leading-zero rank of
    // the remaining 24 hash bits, register = MAX(rho) (mergeable: the
    // 256-value vector is the state a 1000-executor deployment ships
    // instead of user sets; bit_or/max make it associative like the
    // q194 linear-counting bitmap). Output = every register, the RAW
    // HLL estimate (alpha_256·m²/Σ2^−M — all dyadic terms, so the sum
    // is EXACT and order-independent; the division is one identical
    // IEEE op in both engines), and the exact distinct count beside
    // it. No small-range correction branch: it needs ln(), which
    // differs by 1 ulp across libms (the q182 lesson) — q194 covers
    // the linear-counting regime separately.
    "q224_hll_registers" -> { (s, dir) =>
      val uh = Q.uhashSql("22400", "(user_id % 4294967291)")
      val ev = Tables.events(s, dir).select(col("user_id"))
      val regs = ev
        .withColumn("h", expr(uh))
        .withColumn("reg", expr("h % 256"))
        .withColumn("rho", expr(rhoCase("h DIV 256")))
        .groupBy(col("reg")).agg(max(col("rho")).as("rho"))
      val all = s.range(256).toDF("reg")
        .join(regs, Seq("reg"), "left")
        .select(col("reg").cast("long").as("reg"),
          coalesce(col("rho"), lit(0)).cast("int").as("rho"))
      val est = all
        .agg(sum(expr("1.0D / CAST(shiftleft(CAST(1 AS BIGINT), rho) AS DOUBLE)"))
          .as("ssum"))
        .select(lit(-1L).as("reg"),
          expr("0.7213D / (1.0D + 1.079D / 256.0D) * 256.0D * 256.0D / ssum").as("v"))
      val exact = ev.agg(countDistinct(col("user_id")).cast("double").as("v"))
        .select(lit(-2L).as("reg"), col("v"))
      all.select(col("reg"), col("rho").cast("double").as("v"))
        .union(est).union(exact)
        .orderBy(col("reg"))
    },

    // KMV / THETA SKETCH set expressions: per event type, the k=64
    // MINIMUM distinct hash values of its user set (the
    // order-statistics sketch family — distinct from q224's HLL
    // registers and q194's linear-counting bitmap). Per type pair:
    // distinct-count estimates for A, B and A∪B from the k-th
    // minimum ((k−1)·P DIV h_k — pure integer arithmetic), the
    // inclusion-exclusion intersection estimate, and the EXACT
    // intersection beside them. Scale shape: the per-type top-k runs
    // as a rank-filter window Spark rewrites to WindowGroupLimit
    // (map-side partial top-k, no full sort); everything downstream
    // operates on ≤ 5·64 sketch rows — the whole point of shipping
    // sketches instead of user sets.
    "q228_kmv_sketch" -> { (s, dir) =>
      val uh = Q.uhashSql("22800", "(user_id % 4294967291)")
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val hashes = ev.distinct()
        .withColumn("h", expr(uh))
        .select(col("event_type").as("t"), col("h")).distinct()
      val w = Window.partitionBy(col("t")).orderBy(col("h"))
      val kmv = hashes.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 64)
        .select(col("t"), col("h"), col("rk"))
      def kth(df: DataFrame, t: String, h: String) = df
        .filter(col("rk") === 64)
        .select(col("t").as(t), col("h").as(h))
      val est = kth(kmv, "t", "hk")
        .select(col("t"), expr("63 * 4294967291 DIV hk").as("est"))
      // union sketch per pair: the 64 smallest of the merged sets
      val a = kmv.select(col("t").as("ta"), col("h"))
      val b = kmv.select(col("t").as("tb"), col("h"))
      val merged = a.crossJoin(b.select(col("tb")).distinct())
        .filter(col("ta") < col("tb"))
        .select(col("ta"), col("tb"), col("h"))
        .union(b.crossJoin(a.select(col("ta")).distinct())
          .filter(col("ta") < col("tb"))
          .select(col("ta"), col("tb"), col("h")))
        .distinct() // 10 pairs × ≤128 sketch rows
      val wu = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
      val estU = merged.withColumn("rk", row_number().over(wu))
        .filter(col("rk") === 64)
        .select(col("ta"), col("tb"), expr("63 * 4294967291 DIV h").as("est_union"))
      // exact intersection per pair from the distinct (user, type) set
      val ut = ev.distinct()
      val exact = ut.select(col("event_type").as("ta"), col("user_id"))
        .join(ut.select(col("event_type").as("tb"), col("user_id")), Seq("user_id"))
        .filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("exact_inter"))
      estU
        .join(est.select(col("t").as("ta"), col("est").as("est_a")), Seq("ta"))
        .join(est.select(col("t").as("tb"), col("est").as("est_b")), Seq("tb"))
        .join(exact, Seq("ta", "tb"))
        .select(col("ta"), col("tb"), col("est_a"), col("est_b"),
          col("est_union"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
          col("exact_inter"))
        .orderBy(col("ta"), col("tb"))
    },

    // SMALL-FILE COMPACTION (table maintenance — the lakehouse
    // OPTIMIZE/bin-pack operation every 100 TB deployment schedules):
    // the events table is first materialized as a 64-file small-file
    // storm, then compacted by bin-packing into ceil(n/25000)
    // round-robin files. The audit row carries the ACTUAL filesystem
    // file counts (storm + compacted — deterministic because
    // round-robin leaves no empty partitions and AQE does not
    // override an explicit numbered repartition) plus the
    // order-independent content checksum and cents mass of the
    // COMPACTED table, which the oracle recomputes from the logical
    // source — rows may move between files, but nothing may be lost,
    // duplicated, or mutated. The one count() is a driver scalar.
    "q226_compact_files" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val scratch = scratchDir(s, "graft_compact")
      val small = s"$scratch/small"
      val packed = s"$scratch/packed"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          cents(col("value")).as("c"))
        .repartition(64).write.mode("overwrite").parquet(small)
      val back = s.read.parquet(small)
      val n = back.count()
      val k = ((n + 24999L) / 25000L).toInt
      back.repartition(k).write.mode("overwrite").parquet(packed)
      def parts(d: String): Long =
        new java.io.File(d).listFiles.count(_.getName.startsWith("part-")).toLong
      val (fSmall, fPacked) = (parts(small), parts(packed))
      s.read.parquet(packed)
        .select(concat_ws("|", col("event_id"), col("user_id"),
          col("event_type"), col("c")).as("rs"), col("c"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("rolling_hash(rs)")).as("checksum"),
          sum(col("c")).as("value_c"))
        .select(col("n_rows"), col("checksum"), col("value_c"),
          lit(fSmall).as("files_small"), lit(fPacked).as("files_packed"))
    },

    // PREFIX-FILTERED SET-SIMILARITY JOIN (the PPJoin family — THE
    // classic similarity-join optimization, distinct from q40's LSH
    // and q25's single-gram blocking): candidate pairs must share a
    // token in each document's RARE-FIRST PREFIX (tokens ordered by
    // global document frequency ascending; prefix length |d| DIV 2 + 1
    // suffices for Jaccard ≥ 0.5 — a pair with NO prefix token in
    // common provably cannot reach the threshold), then the exact
    // Jaccard gate 3·|∩| ≥ |A|+|B| (⟺ |∩|/|∪| ≥ 1/2, integers only).
    // Scale shape: frequent tokens never generate candidates — the
    // pair explosion rides the rare tail, which is the whole point.
    // The corpus slice (doc_id ≡ 1 mod 16) bounds the demo: this
    // synthetic corpus is SATURATED with near-duplicates, so the TRUE
    // pair count itself grows quadratically with the duplication
    // factor (the q196 scale-ladder finding) — production composes
    // exact dedup first.
    "q241_prefix_simjoin" -> { (s, dir) =>
      val toks = Tables.table(s, dir, "documents")
        .filter(col("doc_id") % 16 === 1)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .persist() // referenced by df/sized/ranked and BOTH verify sides
      val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val sized = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val ranked = toks.join(df, Seq("tok"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
        .join(sized, Seq("doc_id"))
      val prefix = ranked.filter(col("rk") <= expr("sz DIV 2 + 1"))
        .select(col("doc_id"), col("tok"))
      val cand = prefix.select(col("doc_id").as("a"), col("tok"))
        .join(prefix.select(col("doc_id").as("b"), col("tok")), Seq("tok"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
      val ta = toks.select(col("doc_id").as("a"), col("tok"))
      val tb = toks.select(col("doc_id").as("b"), col("tok"))
      val inter = cand.join(ta, Seq("a")).join(tb, Seq("b", "tok"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sized.select(col("doc_id").as("a"), col("sz").as("na")), Seq("a"))
        .join(sized.select(col("doc_id").as("b"), col("sz").as("nb")), Seq("b"))
        .filter(col("inter") * 3 >= col("na") + col("nb"))
        .select(col("a"), col("b"), col("inter"), col("na"), col("nb"))
        .orderBy(col("a"), col("b"))
    },

    // RATIO-TO-PARENT ROLLUP (the BI staple grouping-sets don't give
    // you: every nation's revenue as an exact ppm share of its
    // region, every region's as a share of the world): three
    // aggregation levels from ONE fact pass (nation agg, then two
    // algebraic re-aggs of IT — region and world never re-scan the
    // facts), shares by integer DIV with decimal-widened products.
    "q239_ratio_to_parent" -> { (s, dir) =>
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_suppkey").as("sk"), cents(col("l_extendedprice")).as("rc"))
      val sup = Tables.table(s, dir, "supplier")
        .select(col("s_suppkey").as("sk"), col("s_nationkey").as("nk"))
      val nat = Tables.table(s, dir, "nation")
        .select(col("n_nationkey").as("nk"), col("n_name").as("nation"),
          col("n_regionkey").as("rk"))
      val reg = Tables.table(s, dir, "region")
        .select(col("r_regionkey").as("rk"), col("r_name").as("region"))
      val byNation = li.join(sup, Seq("sk")).join(nat, Seq("nk"))
        .join(reg, Seq("rk"))
        .groupBy(col("region"), col("nation"))
        .agg(sum(col("rc")).as("rev_c"))
      val byRegion = byNation.groupBy(col("region"))
        .agg(sum(col("rev_c")).as("region_c"))
      val world = byRegion.agg(sum(col("region_c")).as("world_c"))
      byNation.join(byRegion, Seq("region")).crossJoin(world)
        .select(col("region"), col("nation"), col("rev_c"),
          expr("CAST(CAST(rev_c AS DECIMAL(38,0)) * 1000000 DIV region_c AS BIGINT)")
            .as("share_of_region_ppm"),
          expr("CAST(CAST(region_c AS DECIMAL(38,0)) * 1000000 DIV world_c AS BIGINT)")
            .as("region_share_ppm"))
        .orderBy(col("region"), col("nation"))
    },

    // ANTI-ENTROPY REPAIR PLAN (Merkle-style digest compare — what a
    // replicated 100 TB store runs to find WHICH ranges need repair
    // without shipping rows): the two q229 snapshot versions are
    // digested per key-range bucket (64 buckets, order-independent
    // sum of per-row rolling hashes + count), buckets join on the
    // digest pair, and only mismatched buckets surface — with their
    // per-side counts, the row-level repair size bound, and the
    // match verdict. Exchange = 2×64 digest rows, never the tables.
    "q240_merkle_repair" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), cents(col("value")).as("c"))
      def digest(df: DataFrame, cEx: Column) = df
        .select(expr("event_id % 64").as("bucket"),
          concat_ws("|", col("event_id"), cEx).as("rs"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(expr("rolling_hash(rs)")).as("dg"))
      val v1 = digest(ev.filter(col("event_id") % 11 =!= 5), col("c"))
      val v2 = digest(ev.filter(col("event_id") % 13 =!= 2),
        col("c") + when(col("event_id") % 7 === 0, lit(100L)).otherwise(lit(0L)))
      v1.select(col("bucket"), col("n").as("n1"), col("dg").as("dg1"))
        .join(v2.select(col("bucket"), col("n").as("n2"), col("dg").as("dg2")),
          Seq("bucket"), "fullOuter")
        .select(col("bucket"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          coalesce(col("n2"), lit(0L)).as("n2"),
          when(coalesce(col("dg1"), lit(-1L)) === coalesce(col("dg2"), lit(-1L)) &&
            coalesce(col("n1"), lit(0L)) === coalesce(col("n2"), lit(0L)), lit(0L))
            .otherwise(lit(1L)).as("needs_repair"))
        .filter(col("needs_repair") === 1)
        .orderBy(col("bucket"))
    },

    // EXACT KOLMOGOROV–SMIRNOV DRIFT DISTANCE per segment (the
    // unbinned, exact big-brother of q208's histogram drift gate):
    // order values of the time-split first vs second half compared by
    // the max CDF gap, computed as max |c1·n2 − c2·n1| over the
    // merged value-sorted sequence — pure integer cross-
    // multiplication, no division until the final ppm. The gap is
    // only evaluated where the next value differs (tied values step
    // both CDFs atomically — the lead() gate), windows are SEGMENT-
    // partitioned, and the time split derives from the 1-row min/max
    // scalar like q237.
    "q238_ks_drift" -> { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
          cents(col("o_totalprice")).as("x"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      val c = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
      val Row(lo: Long, hi: Long) = o.agg(min(col("us")), max(col("us"))).head()
      val mid = lo + (hi - lo) / 2
      val j = o.join(c, Seq("ck"))
        .withColumn("h", when(col("us") < mid, lit(1)).otherwise(lit(2)))
      val ns = j.groupBy(col("seg"))
        .agg(sum(when(col("h") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("h") === 2, 1L).otherwise(0L)).as("n2"))
      val w = Window.partitionBy(col("seg")).orderBy(col("x"), col("h"), col("ok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wl = Window.partitionBy(col("seg")).orderBy(col("x"), col("h"), col("ok"))
      j.select(col("seg"), col("x"), col("h"), col("ok"))
        .withColumn("c1", sum(when(col("h") === 1, 1L).otherwise(0L)).over(w))
        .withColumn("c2", sum(when(col("h") === 2, 1L).otherwise(0L)).over(w))
        .withColumn("nx", lead(col("x"), 1).over(wl))
        .filter(col("nx").isNull || col("nx") =!= col("x"))
        .join(ns, Seq("seg"))
        .groupBy(col("seg"))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_num"))
        .select(col("seg"), col("n1"), col("n2"), col("d_num"),
          expr("CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000 DIV (n1 * n2) AS BIGINT)")
            .as("ks_ppm"))
        .orderBy(col("seg"))
    },

    // TIME-TRAVEL STATE RECONSTRUCTION (the lakehouse "read the table
    // AS OF T" feature, generalizing q106's latest-record compaction
    // from T = ∞ to multiple checkpoints in ONE pass): per customer
    // and per reconstruction point T (the Δ/4 · {1,2,3} quantile
    // instants of the order history — integer-derived identically in
    // both engines), the state is the latest order with date ≤ T,
    // rolled up per (T, status). The fact table is scanned ONCE: each
    // row explodes into only the T lanes it qualifies for
    // (array-local filter — no per-T re-scan, no cross join), then
    // one hash agg picks the per-(customer, T) max_by. The min/max
    // collect is a 1-row scalar.
    "q237_time_travel" -> { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
          col("o_orderstatus").as("st"), cents(col("o_totalprice")).as("pc"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      val Row(lo: Long, hi: Long) = o.agg(min(col("us")), max(col("us"))).head()
      val ts = (1 to 3).map(k => lo + (hi - lo) * k / 4)
      o.withColumn("t", explode(
          filter(array(ts.map(lit(_)): _*), t => col("us") <= t)))
        .groupBy(col("ck"), col("t"))
        .agg(max(struct(col("us"), col("ok"), col("st"), col("pc"))).as("m"))
        .groupBy(col("t"), col("m.st").as("status"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("m.ok")).as("okey_sum"), sum(col("m.pc")).as("price_c"))
        .orderBy(col("t"), col("status"))
    },

    // LINEAR-INTERPOLATION GRID RESAMPLE (two-sided — the q168 LOCF
    // sibling and the interp1d shape of demoTalkNet.py:168–175 at
    // corpus scale): per user, every hour boundary gets the exact
    // RATIONAL linear blend of its surrounding observations — num =
    // y0·(t1−t0) + (y1−y0)·(g−t0), den = t1−t0, whole-second
    // timestamps so products stay ≤ ~2.6e11 (exact BIGINT); boundary
    // grid points carry/backfill with den = 1. Grid size = span ×
    // users (independent of event count, the q168 property); the
    // surrounding observations come from ONE last/first IGNORE-NULLS
    // window pair per user over the merged obs+grid timeline — no
    // self-joins, no per-gap scans. Same-second ties: obs sort before
    // their hour's grid point, so an observation exactly on the
    // boundary is t0 with g−t0 = 0 (the exact hit).
    "q236_grid_interp" -> { (s, dir) =>
      val ob = Tables.events(s, dir)
        .withColumn("hr", expr("ts_ns DIV 3600000000000"))
        .groupBy(col("user_id"), col("hr"))
        .agg(max(struct(col("ts_ns"), col("event_id"),
          cents(col("value")).as("cents"))).as("m"))
        .select(col("user_id"), col("hr"),
          expr("m.ts_ns DIV 1000000000").as("t"), col("m.cents").as("y"))
        .persist() // bounds agg AND the merged timeline read it
      val grid = ob.groupBy(col("user_id"))
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("hr"))
        .select(col("user_id"), col("hr"), (col("hr") * 3600).as("time"),
          lit(1).as("kind"), lit(null).cast("long").as("t"),
          lit(null).cast("long").as("y"))
      val merged = ob
        .select(col("user_id"), col("hr"), col("t").as("time"),
          lit(0).as("kind"), col("t"), col("y"))
        .union(grid)
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("time"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Next observation via the REVERSED sort, not a shrinking
      // `currentRow..unboundedFollowing` frame: Spark's
      // UnboundedFollowingWindowFunctionFrame recomputes the frame
      // from scratch per row (O(n²) per partition — measured 3× on
      // this query vs its O(n) sibling), while the growing
      // `unboundedPreceding..currentRow` frame accumulates in O(n).
      // (time, kind) is a strict total order within a user (one
      // observation per hour, one grid row per hour, ties broken by
      // kind), so descending order reverses it exactly and
      // first-non-null-looking-forward ≡ last-non-null over the
      // reversed running frame.
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("time").desc, col("kind").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      merged
        .withColumn("t1", last(col("t"), ignoreNulls = true).over(wNext))
        .withColumn("y1", last(col("y"), ignoreNulls = true).over(wNext))
        .withColumn("t0", last(col("t"), ignoreNulls = true).over(wPrev))
        .withColumn("y0", last(col("y"), ignoreNulls = true).over(wPrev))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("hr"),
          when(col("t0").isNull, col("y1"))
            .when(col("t1").isNull, col("y0"))
            .when(col("t1") === col("t0"), col("y0"))
            .otherwise(col("y0") * (col("t1") - col("t0")) +
              (col("y1") - col("y0")) * (col("time") - col("t0"))).as("num"),
          when(col("t0").isNull || col("t1").isNull ||
            col("t1") === col("t0"), lit(1L))
            .otherwise(col("t1") - col("t0")).as("den"))
        .orderBy(col("user_id"), col("hr"))
    },

    // SPEARMAN RANK CORRELATION of order value vs the customer's
    // account balance — rank-transform + Pearson-on-ranks. Both rank
    // passes run through Enumerate.globalRowNumber (range-partition +
    // per-partition offsets — the scale-safe global enumeration, the
    // q90 machinery), NEVER a single-task global window; ranks are
    // positions in a deterministic TOTAL order (value, orderkey — the
    // near-unique-values Spearman variant, pinned rather than
    // averaged ties). Sufficient statistics are exact integer sums of
    // rank products (n ≤ 2^31 keeps n·Σr² inside DECIMAL(38,0)); the
    // only doubles are the final identical-expression-tree
    // num/sqrt(vx)·sqrt(vy) — the q120 Pearson policy.
    "q235_spearman" -> { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
          cents(col("o_totalprice")).as("x"))
      val c = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("ck"), cents(col("c_acctbal")).as("y"))
      val j = o.join(c, Seq("ck")).select(col("ok"), col("x"), col("y"))
      val rx = graft.operators.Enumerate.globalRowNumber(j, "rx", col("x"), col("ok"))
      val rxy = graft.operators.Enumerate.globalRowNumber(rx, "ry", col("y"), col("ok"))
      val agg = rxy.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
        sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
      agg.select(col("n").cast("long").as("n"),
        expr("CAST(CAST(n*sxy - sx*sy AS DOUBLE) / " +
          "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * " +
          "sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS DOUBLE)").as("rho"))
    },

    // EXACT GINI COEFFICIENT per market segment (the inequality
    // metric next to q183's HHI): gini = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx)
    // over the value-sorted orders of each segment. The rank window
    // is SEGMENT-partitioned (never global), the numerator folds to
    // 2·Σ(rank·x) − (n+1)·Σx — pure integers on cents, tie-order
    // invariant (equal x ⇒ the coefficient sum over the tie group is
    // permutation-free) — and the ppm quotient widens through
    // DECIMAL(38,0)/HUGEINT like q197.
    "q234_gini" -> { (s, dir) =>
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
          cents(col("o_totalprice")).as("x"))
      val c = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
      val w = Window.partitionBy(col("seg")).orderBy(col("x"), col("ok"))
      o.join(c, Seq("ck"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("seg"))
        // rank×cents products are summed in DECIMAL(38,0) (the q235
        // policy, mirroring the oracle's HUGEINT): a BIGINT srx wraps
        // silently once per-segment n·Σx clears 2⁶³ (~sf100 order
        // volumes). rn is widened BEFORE the multiply so the per-row
        // product can never wrap either.
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("rn").cast("decimal(38,0)") * col("x")).as("srx"))
        .select(col("seg"), col("n"), col("sx"),
          expr("CAST((2 * CAST(srx AS DECIMAL(38,0)) - " +
            "(CAST(n AS DECIMAL(38,0)) + 1) * CAST(sx AS DECIMAL(38,0))) " +
            "* 1000000 DIV (CAST(n AS DECIMAL(38,0)) * " +
            "CAST(sx AS DECIMAL(38,0))) AS BIGINT)")
            .as("gini_ppm"))
        .orderBy(col("seg"))
    },

    // CONSISTENT-HASHING RESHARD AUDIT (the elasticity planning query
    // behind any keyed 100 TB layout): a 64-vnode-per-shard hash ring
    // with 4 shards vs the same ring grown to 5; every user key is
    // assigned to its clockwise-successor vnode in both rings and the
    // movement matrix comes out — consistent hashing's contract (keys
    // only ever move TO the new shard, ~1/(N+1) of them) is then a
    // visible property of the rows, not an assumption. Plan: the ring
    // is 320 rows — each key scans it via a broadcast nested loop
    // (O(vnodes) per key, no shuffle of the key set beyond the final
    // rollup), the same bounded-small-side shape as q228's sketches.
    "q232_consistent_hashing" -> { (s, dir) =>
      val ringPos = Q.uhashSql("23200", "(s * 1000 + v)")
      val keyHash = Q.uhashSql("23201", "(user_id % 4294967291)")
      val ring = s.range(5).toDF("s").crossJoin(s.range(64).toDF("v"))
        .select(col("s"), col("v"), expr(ringPos).as("pos"))
      val keys = Tables.events(s, dir).select(col("user_id")).distinct()
        .withColumn("kh", expr(keyHash))
      val dist = keys.crossJoin(broadcast(ring))
        .withColumn("d",
          expr("((pos - kh) % 4294967291 + 4294967291) % 4294967291"))
      def assign(df: DataFrame, name: String) = df
        .groupBy(col("user_id"))
        .agg(min(struct(col("d"), col("s"), col("v"))).as("m"))
        .select(col("user_id"), col("m.s").as(name))
      assign(dist.filter(col("s") <= 3), "shard_before")
        .join(assign(dist, "shard_after"), Seq("user_id"))
        .groupBy(col("shard_before"), col("shard_after"))
        .agg(count(lit(1)).as("n_keys"))
        .orderBy(col("shard_before"), col("shard_after"))
    },

    // LARGEST-REMAINDER BUDGET ALLOCATION (exact proportional
    // sampling-quota assignment — the integer version of "sample
    // 10,000 docs proportional to each language's token mass"):
    // base_i = B·w_i DIV W, then the B − Σbase leftover units go to
    // the largest remainders (ties to the smaller lang string). Every
    // number is integer arithmetic; Σ alloc = B by construction and
    // the oracle re-derives the whole thing including the remainder
    // ranking. The only window runs over the ≤ |langs| stratum table.
    "q233_quota_allocation" -> { (s, dir) =>
      val B = 10000L
      val w = Tables.table(s, dir, "documents")
        .groupBy(col("lang")).agg(sum(col("n_chars")).as("w"))
      val tot = w.agg(sum(col("w")).as("wt"))
      val based = w.crossJoin(tot) // 1-row scalar attach
        .select(col("lang"), col("w"),
          // DECIMAL(38,0) product (HUGEINT on the oracle side): B·w
          // passes 2^63 long before the QUOTIENT does
          expr(s"CAST($B * CAST(w AS DECIMAL(38,0)) DIV wt AS BIGINT)").as("base"),
          expr(s"($B * CAST(w AS DECIMAL(38,0))) % wt").as("rem"),
          col("wt"))
      val leftover = based
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"))).cast("long"))
        .withColumn("left_units",
          (lit(B) - sum(col("base")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing))))
        .withColumn("extra",
          when(col("rk") <= col("left_units"), lit(1L)).otherwise(lit(0L)))
      leftover
        .select(col("lang"), col("w"), col("base"), col("extra"),
          (col("base") + col("extra")).as("alloc"))
        .orderBy(col("lang"))
    },

    // BENFORD FIRST-DIGIT AUDIT (fraud / data-quality drift): the
    // leading digit of every order total vs Benford's law. The
    // expected shares are FIXED ppm constants (log10(1+1/d) is data-
    // independent — embedding the table dodges any runtime log, the
    // q182 libm lesson), digits come off the cents integer's decimal
    // string, observed shares are integer DIV ppm, and the flag is an
    // integer comparison. One hash agg over orders; 9 output rows.
    "q230_benford_audit" -> { (s, dir) =>
      val expected = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val expDf = s.createDataFrame(
        expected.zipWithIndex.map { case (ppm, i) => (i + 1L, ppm) })
        .toDF("digit", "expected_ppm")
      val d = Tables.table(s, dir, "orders")
        .select(cents(col("o_totalprice")).as("c"))
        .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = d.agg(sum(col("n")).as("tot"))
      d.crossJoin(tot) // 1-row scalar attach
        .join(expDf, Seq("digit"))
        .select(col("digit"), col("n"),
          expr("n * 1000000 DIV tot").as("observed_ppm"),
          col("expected_ppm"))
        .withColumn("dev_ppm",
          abs(col("observed_ppm") - col("expected_ppm")))
        .withColumn("flagged",
          when(col("dev_ppm") > 10000, lit(1L)).otherwise(lit(0L)))
        .orderBy(col("digit"))
    },

    // PEAK-CONCURRENCY SWEEP LINE (occupancy profiling): sessionize
    // events per user (30-min gaps), turn each session into +1/−1
    // boundaries, and report each hour's peak concurrent session
    // count. The running count NEVER uses a global single-partition
    // window: within-hour prefix sums run partitioned by hour, and
    // the cross-hour carry is a cumulative sum over the tiny hour
    // table (the q217 incremental pattern) — peak_h = carry_h +
    // max(within-hour prefix). Ties order starts before ends
    // (delta DESC), and the per-hour MAX is invariant to permutations
    // within equal (ts, delta) groups, which is what makes the
    // two-phase plan equal to the oracle's naive global sweep.
    "q231_peak_concurrency" -> { (s, dir) =>
      val gap = 1800L * 1000000000L
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts_ns"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
      val sessions = ev
        .withColumn("newSess",
          when(col("ts_ns") - lag(col("ts_ns"), 1).over(wU) > gap, 1)
            .when(lag(col("ts_ns"), 1).over(wU).isNull, 1).otherwise(0))
        .withColumn("sid", sum(col("newSess")).over(wU))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts_ns")).as("start_ns"), max(col("ts_ns")).as("end_ns"))
      val bounds = sessions
        .select(col("start_ns").as("ts"), lit(1L).as("delta"))
        .union(sessions.select(col("end_ns").as("ts"), lit(-1L).as("delta")))
        .withColumn("hour", expr("ts DIV 3600000000000"))
      val wH = Window.partitionBy(col("hour"))
        .orderBy(col("ts"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perHour = bounds
        .withColumn("run", sum(col("delta")).over(wH))
        .groupBy(col("hour"))
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"),
          sum(when(col("delta") === -1, 1L).otherwise(0L)).as("n_ends"),
          max(col("run")).as("m"),
          sum(col("delta")).as("net"))
      val wC = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perHour
        .withColumn("carry", coalesce(sum(col("net")).over(wC), lit(0L)))
        .select(col("hour"), col("n_starts"), col("n_ends"),
          (col("carry") + col("m")).as("peak"))
        .orderBy(col("hour"))
    },

    // SNAPSHOT DIFF (the migration/backfill audit next to q167's
    // MERGE-apply and q202's IVM): two table versions — v1 lacks the
    // "later-inserted" rows (event_id ≡ 5 mod 11), v2 lacks the
    // "deleted" ones (≡ 2 mod 13) and carries value+1 updates
    // (≡ 0 mod 7) — compared by ONE full-outer hash join on the key
    // with a cents compare, rolled up into added/removed/changed/
    // unchanged counts and the net value delta. This is the detect
    // side of change management (q167 is the apply side): rows may
    // not silently differ between snapshots without landing in
    // exactly one category.
    "q229_snapshot_diff" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), cents(col("value")).as("c"))
      val v1 = ev.filter(col("event_id") % 11 =!= 5)
        .select(col("event_id"), col("c").as("c1"))
      val v2 = ev.filter(col("event_id") % 13 =!= 2)
        .select(col("event_id"),
          (col("c") + when(col("event_id") % 7 === 0, lit(100L)).otherwise(lit(0L)))
            .as("c2"))
      v1.join(v2, Seq("event_id"), "fullOuter")
        .select(
          when(col("c1").isNull, lit("added"))
            .when(col("c2").isNull, lit("removed"))
            .when(col("c1") =!= col("c2"), lit("changed"))
            .otherwise(lit("unchanged")).as("category"),
          coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L)))
        .toDF("category", "delta_c")
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n_rows"), sum(col("delta_c")).as("net_delta_c"))
        .orderBy(col("category"))
    },

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
      // "Min click ts over all FOLLOWING rows" via the REVERSED sort
      // and a growing `unboundedPreceding..currentRow` frame — O(n)
      // per user — never the shrinking `1..unboundedFollowing` frame,
      // which Spark recomputes from scratch per row (O(n²): a
      // 1M-event hub user would get a 10¹²-op window task). The
      // running frame includes the current row, but a view row
      // contributes null to min(when(kind='click',...)) so the result
      // is identical to the strictly-following frame for every row
      // this query keeps.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("kr").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
,

    // A/B EXPERIMENT READOUT, exact: users hash into two arms (the
    // q49 deterministic-assignment policy), conversion = any purchase
    // event, and the 2×2 table decides significance by the χ²
    // statistic — compared against the 3.84 critical value ENTIRELY
    // in integers: N(ad−bc)²·100 > 384·(a+b)(c+d)(a+c)(b+d), solved
    // in BigInt on the driver (the collect is the 2×2 table; row
    // count irrelevant) with the exact χ² rational shipped as
    // strings. No float ever decides the verdict.
    "q213_ab_test" -> { (s, dir) =>
      val (ha, hb) = graft.operators.Dedup.affine(21300)
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
          .as("conv"))
        .withColumn("arm", pmod(lit(ha) * pmod(col("user_id"), lit(4294967291L)) +
          lit(hb), lit(4294967291L)) % 2)
      val t = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("cv"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (nC, cvC) = t.getOrElse(0L, (0L, 0L))
      val (nT, cvT) = t.getOrElse(1L, (0L, 0L))
      val (a, b2, c, d) =
        (BigInt(cvT), BigInt(nT - cvT), BigInt(cvC), BigInt(nC - cvC))
      val n = a + b2 + c + d
      val num = n * (a * d - b2 * c).pow(2)
      val den = (a + b2) * (c + d) * (a + c) * (b2 + d)
      val sig = if (den != 0 && num * 100 > den * 384) 1L else 0L
      s.createDataFrame(Seq((nC, cvC, nT, cvT, num.toString, den.toString, sig)))
        .toDF("n_control", "conv_control", "n_treat", "conv_treat",
          "chi2_num", "chi2_den", "significant")
    },

    // CHECKPOINTED STREAM RESUME: the per-type rollup computed by TWO
    // StreamingQuery lifetimes over one checkpoint — stop after the
    // first half, restart, process the second half from the recovered
    // offset log + state store. The complete-mode answer after the
    // restart must equal the batch aggregate of the whole corpus: the
    // crash-recovery contract, under the oracle gate
    // (streaming/TwsTimeline.resumeRollup).
    "q215_stream_resume" -> { (s, dir) =>
      graft.streaming.TwsTimeline.resumeRollup(s, dir)
    },

    // TIME-WEIGHTED AVERAGE (TWAP): per user, each observation holds
    // until the next one; the mean weighted by holding time is the
    // exact rational Σ cents·gap_s / Σ gap_s with gap_s the gap
    // TRUNCATED to whole seconds — the same floor division on both
    // engines, so the rational is bit-equal however ragged the
    // sub-second parts are. One lead() window per user, rationals
    // shipped as num/den.
    "q216_twap" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          cents(col("value")).as("c"))
        .withColumn("nxt", lead(col("ts_ns"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("user_id"), col("c"),
          expr("(nxt - ts_ns) DIV 1000000000").as("gap_s"))
        .groupBy(col("user_id"))
        // BIGINT-safe by construction: a user's gaps are DISJOINT, so
        // Σ c·gap ≤ max_c · (time span) ≈ 5e7 cents · 3e9 s (a
        // century) ≈ 1.5e17 < 2^63 — bounded headroom, not the q201
        // silent-wrap class.
        .agg(count(lit(1)).as("n_holds"),
          sum(col("c") * col("gap_s")).as("twap_num"),
          sum(col("gap_s")).as("twap_den"))
        .orderBy(col("user_id"))
    },

    // INCREMENTAL SESSIONIZATION: sessions computed on each half of
    // the corpus INDEPENDENTLY (the stored-batch shape — history is
    // never re-scanned), then merged: because the split is
    // time-ordered, the ONLY sessions that can bridge are each user's
    // last-of-A and first-of-B, so the merge is one per-user join and
    // an O(1) adjustment — not a re-sessionization. Output carries
    // the merged count next to the full single-pass recompute; the
    // row is its own audit (equal by the bridging argument).
    "q217_incremental_sessions" -> { (s, dir) =>
      val gapNs = 1800L * 1000000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id")).persist()
      val Array(lo, hi) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray // 1-row scalar
      val b = lo + (hi - lo) / 2
      def sessions(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        df.withColumn("prev", lag(col("ts_ns"), 1).over(w))
          .withColumn("fresh", when(col("prev").isNull ||
            col("ts_ns") - col("prev") > gapNs, lit(1L)).otherwise(lit(0L)))
          .withColumn("sid", sum(col("fresh")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts_ns")).as("sb"), max(col("ts_ns")).as("se"),
            count(lit(1)).as("n"))
      }
      val a = sessions(ev.filter(col("ts_ns") < b))
      val b2 = sessions(ev.filter(col("ts_ns") >= b))
      val aStats = a.groupBy(col("user_id"))
        .agg(count(lit(1)).as("na"), max(col("se")).as("last_end"))
      val bStats = b2.groupBy(col("user_id"))
        .agg(count(lit(1)).as("nb"), min(col("sb")).as("first_start"))
      val merged = aStats.join(bStats, Seq("user_id"), "fullOuter")
        .select(col("user_id"),
          (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) -
            when(col("last_end").isNotNull && col("first_start").isNotNull &&
              col("first_start") - col("last_end") <= gapNs, lit(1L))
              .otherwise(lit(0L))).as("n_merged"),
          when(col("last_end").isNotNull && col("first_start").isNotNull &&
            col("first_start") - col("last_end") <= gapNs, lit(1L))
            .otherwise(lit(0L)).as("bridged"))
      val full = sessions(ev).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_full"), sum(col("n")).as("n_events"))
      merged.join(full, Seq("user_id"))
        .select(col("user_id"), col("n_full"), col("n_merged"),
          col("bridged"), col("n_events"))
        .orderBy(col("user_id"))
    },

    // GROUP K-FOLD ASSIGNMENT with leakage audit: folds hash from the
    // USER (the grouping key), so no user's events can straddle a
    // train/validation boundary — the leakage mode that silently
    // inflates every metric. Per-fold composition rows plus one audit
    // row (fold −1) counting users observed in more than one fold —
    // which the construction forces to zero, and the oracle verifies
    // from scratch. The audit is a second agg over the per-user fold
    // set, not a trusted constant.
    "q218_group_kfold" -> { (s, dir) =>
      val (ha, hb) = graft.operators.Dedup.affine(21800)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"))
        .withColumn("fold", pmod(lit(ha) * pmod(col("user_id"), lit(4294967291L)) +
          lit(hb), lit(4294967291L)) % 5)
      val perFold = ev.groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
            .as("n_purchases"))
      val audit = ev.groupBy(col("user_id"))
        .agg(countDistinct(col("fold")).as("nf"))
        .agg(sum(when(col("nf") > 1, lit(1L)).otherwise(lit(0L))).as("leaked"))
        .select(lit(-1L).as("fold"), col("leaked").as("n_users"),
          lit(0L).as("n_events"), lit(0L).as("n_purchases"))
      perFold.union(audit).orderBy(col("fold"))
    },

    // WATERMARK LATENESS PROFILE: how out-of-order does this stream
    // ARRIVE — the operational question behind every watermark delay
    // choice (q76/q193's "1 minute" is a CLAIM; this query measures
    // the corpus). Arrival model: ingest batches hourly and loses
    // intra-batch order (the micro-batch reality), so arrival order =
    // (hour, jitter key from props, id); lateness of an event = how
    // far the per-user event-time high-water mark had already passed
    // it on arrival. One running-max window per user, then a fixed
    // bucket histogram — integers end to end.
    "q219_lateness_profile" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("hour"), col("k"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ns"),
          expr("ts_ns DIV 3600000000000").as("hour"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .withColumn("hwm", max(col("ts_ns")).over(w))
        .withColumn("late_ns", greatest(coalesce(col("hwm") - col("ts_ns"),
          lit(0L)), lit(0L)))
        .select(
          when(col("late_ns") === 0, lit(0L))
            .when(col("late_ns") < 60L * 1000000000L, lit(1L))
            .when(col("late_ns") < 600L * 1000000000L, lit(2L))
            .when(col("late_ns") < 3600L * 1000000000L, lit(3L))
            .otherwise(lit(4L)).as("bucket"),
          col("late_ns"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_events"), max(col("late_ns")).as("max_late_ns"),
          sum(expr("late_ns DIV 1000000000")).as("late_s_sum"))
        .orderBy(col("bucket"))
    },

    // RETENTION/TTL PURGE PLAN: what a 7-day retention policy would
    // delete, per event type — row counts, value mass, payload bytes
    // (props length as the stored-size proxy), and the affected-user
    // count — with "now" pinned to the corpus' max event time so the
    // plan is deterministic. This is the governance dry-run every
    // deletion pipeline executes before it mutates anything; one
    // filter + one hash agg, partition-prunable on a date-partitioned
    // layout.
    "q220_ttl_purge_plan" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("ts_ns"),
          cents(col("value")).as("c"), length(col("props")).cast("long").as("pb"))
      val maxNs = ev.agg(max(col("ts_ns"))).collect()(0).getLong(0) // 1-row scalar
      val cutoff = maxNs - 7L * 86400L * 1000000000L
      ev.filter(col("ts_ns") < cutoff)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("c")).as("value_c"),
          sum(col("pb")).as("payload_bytes"))
        .orderBy(col("event_type"))
    },

    // FUNNEL STAGE LATENCY: per user the SEQUENTIAL funnel first
    // view → first click after it → first purchase after that; per
    // stage gap, exact ORDER STATISTICS instead of interpolated
    // percentiles (median bracket + the 0-based ⌊(n−1)·9/10⌋ p90
    // pick — integer selections, no float interpolation to disagree
    // on). The rank window runs on the per-user gap table (≤ |users|
    // rows), never the event stream.
    "q214_funnel_latency" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ns")).persist()
      val fv = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("fv"))
      val fc = ev.filter(col("event_type") === "click").join(fv, Seq("user_id"))
        .filter(col("ts_ns") > col("fv"))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("fc"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fc, Seq("user_id")).filter(col("ts_ns") > col("fc"))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("fp"))
      val gaps = fv.join(fc, Seq("user_id"))
        .select(col("user_id"), (col("fc") - col("fv")).as("g"),
          lit("view_to_click").as("stage"))
        .union(fc.join(fp, Seq("user_id"))
          .select(col("user_id"), (col("fp") - col("fc")).as("g"),
            lit("click_to_purchase").as("stage")))
      val w = Window.partitionBy(col("stage")).orderBy(col("g"), col("user_id"))
      val wn = Window.partitionBy(col("stage"))
      gaps
        .withColumn("rk", row_number().over(w).cast("long") - 1)
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rk") === expr("(n - 1) DIV 2") ||
          col("rk") === expr("n DIV 2") ||
          col("rk") === expr("((n - 1) * 9) DIV 10"))
        .groupBy(col("stage"))
        .agg(max(col("n")).as("n_users"),
          min(when(col("rk") === expr("(n - 1) DIV 2"), col("g"))).as("median_lo"),
          min(when(col("rk") === expr("n DIV 2"), col("g"))).as("median_hi"),
          min(when(col("rk") === expr("((n - 1) * 9) DIV 10"), col("g"))).as("p90"))
        .orderBy(col("stage"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q241_prefix_simjoin" ->
      s"""WITH toks AS (
        |  SELECT DISTINCT doc_id, tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents WHERE doc_id % 16 = 1)
        |  WHERE tok <> ''),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
        |sized AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |  FROM toks GROUP BY doc_id),
        |ranked AS (
        |  SELECT t.doc_id, t.tok, s.sz,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rk
        |  FROM toks t JOIN df d ON d.tok = t.tok
        |  JOIN sized s ON s.doc_id = t.doc_id),
        |pfx AS (SELECT doc_id, tok FROM ranked WHERE rk <= sz // 2 + 1),
        |cand AS (
        |  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
        |  FROM pfx p1 JOIN pfx p2 ON p2.tok = p1.tok AND p1.doc_id < p2.doc_id),
        |i AS (
        |  SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS inter
        |  FROM cand c
        |  JOIN toks ta ON ta.doc_id = c.a
        |  JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY c.a, c.b)
        |SELECT i.a, i.b, i.inter, sa.sz AS na, sb.sz AS nb
        |FROM i JOIN sized sa ON sa.doc_id = i.a
        |JOIN sized sb ON sb.doc_id = i.b
        |WHERE i.inter * 3 >= sa.sz + sb.sz
        |ORDER BY i.a, i.b""".stripMargin,

    "q239_ratio_to_parent" ->
      s"""WITH bn AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |      AS rev_c
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  GROUP BY 1, 2),
        |br AS (SELECT region, SUM(rev_c) AS region_c FROM bn GROUP BY region),
        |w AS (SELECT SUM(region_c) AS world_c FROM br)
        |SELECT bn.region, bn.nation, bn.rev_c,
        |  CAST(CAST(bn.rev_c AS HUGEINT) * 1000000 // br.region_c AS BIGINT)
        |    AS share_of_region_ppm,
        |  CAST(CAST(br.region_c AS HUGEINT) * 1000000 // w.world_c AS BIGINT)
        |    AS region_share_ppm
        |FROM bn JOIN br ON br.region = bn.region CROSS JOIN w
        |ORDER BY bn.region, bn.nation""".stripMargin,

    "q240_merkle_repair" -> {
      def digest(filt: String, cEx: String) =
        s"""SELECT event_id % 64 AS bucket, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(${Q.polyHashSql(
                  s"concat_ws('|', event_id, $cEx)")}) AS BIGINT) AS dg
           |  FROM (SELECT event_id,
           |      CAST(round(value*100) AS BIGINT) AS c FROM events)
           |  WHERE $filt GROUP BY 1""".stripMargin
      s"""WITH v1 AS (${digest("event_id % 11 <> 5", "c")}),
        |v2 AS (${digest("event_id % 13 <> 2",
             "c + CASE WHEN event_id % 7 = 0 THEN 100 ELSE 0 END")})
        |SELECT COALESCE(v1.bucket, v2.bucket) AS bucket,
        |  COALESCE(v1.n, 0) AS n1, COALESCE(v2.n, 0) AS n2,
        |  CAST(1 AS BIGINT) AS needs_repair
        |FROM v1 FULL OUTER JOIN v2 ON v2.bucket = v1.bucket
        |WHERE NOT (COALESCE(v1.dg, -1) = COALESCE(v2.dg, -1)
        |  AND COALESCE(v1.n, 0) = COALESCE(v2.n, 0))
        |ORDER BY bucket""".stripMargin
    },

    // q238: identical integer KS machinery; the gap gate is the same
    // lead()-differs condition.
    "q238_ks_drift" ->
      s"""WITH o AS (SELECT o.o_custkey AS ck, o.o_orderkey AS ok,
        |    CAST(round(o.o_totalprice*100) AS BIGINT) AS x,
        |    CAST(epoch_us(o.o_orderdate) AS BIGINT) AS us,
        |    c.c_mktsegment AS seg
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM o),
        |j AS (SELECT seg, x, ok,
        |    CASE WHEN us < (SELECT lo + (hi - lo) // 2 FROM b)
        |      THEN 1 ELSE 2 END AS h FROM o),
        |ns AS (SELECT seg,
        |    CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN h = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM j GROUP BY seg),
        |r AS (SELECT seg, x, h, ok,
        |    sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) OVER wr AS c1,
        |    sum(CASE WHEN h = 2 THEN 1 ELSE 0 END) OVER wr AS c2,
        |    lead(x) OVER wo AS nx
        |  FROM j WINDOW
        |    wr AS (PARTITION BY seg ORDER BY x, h, ok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wo AS (PARTITION BY seg ORDER BY x, h, ok)),
        |g AS (SELECT r.seg, ns.n1, ns.n2,
        |    CAST(max(abs(r.c1 * ns.n2 - r.c2 * ns.n1)) AS BIGINT) AS d_num
        |  FROM r JOIN ns ON ns.seg = r.seg
        |  WHERE r.nx IS NULL OR r.nx <> r.x
        |  GROUP BY r.seg, ns.n1, ns.n2)
        |SELECT seg, n1, n2, d_num,
        |  CAST(CAST(d_num AS HUGEINT) * 1000000 // (n1 * n2) AS BIGINT) AS ks_ppm
        |FROM g ORDER BY seg""".stripMargin,

    // q237: the oracle re-derives the reconstruction instants with
    // the same integer arithmetic and re-picks per-(ck, T) latest
    // rows via row_number over (us DESC, ok DESC).
    "q237_time_travel" ->
      s"""WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
        |    o_orderstatus AS st,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS pc,
        |    CAST(epoch_us(o_orderdate) AS BIGINT) AS us FROM orders),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM o),
        |ts AS (SELECT lo + (hi - lo) * k.range // 4 AS t
        |  FROM b, range(1, 4) k),
        |st AS (SELECT o.ck, t.t, o.ok, o.st, o.pc,
        |    row_number() OVER (PARTITION BY o.ck, t.t
        |      ORDER BY o.us DESC, o.ok DESC) AS rn
        |  FROM o JOIN ts t ON o.us <= t.t)
        |SELECT t, st AS status, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(ok) AS BIGINT) AS okey_sum,
        |  CAST(sum(pc) AS BIGINT) AS price_c
        |FROM st WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // q236: same merged-timeline windows; the per-hour compaction
    // mirrors Spark's max_by struct (latest (ts, event_id) per hour).
    "q236_grid_interp" ->
      s"""WITH raw AS (SELECT user_id, epoch_ns(ts) AS ns, event_id,
        |    CAST(round(value*100) AS BIGINT) AS y,
        |    epoch_ns(ts) // 3600000000000 AS hr FROM events),
        |ob AS (SELECT user_id, hr, ns // 1000000000 AS t, y FROM raw
        |  QUALIFY row_number() OVER (PARTITION BY user_id, hr
        |    ORDER BY ns DESC, event_id DESC) = 1),
        |bounds AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi
        |  FROM ob GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS hr
        |  FROM bounds),
        |m AS (
        |  SELECT user_id, hr, t AS tm, 0 AS kind, t, y FROM ob
        |  UNION ALL
        |  SELECT user_id, hr, hr*3600, 1, NULL, NULL FROM grid),
        |w AS (SELECT *,
        |    last_value(t IGNORE NULLS) OVER wp AS t0,
        |    last_value(y IGNORE NULLS) OVER wp AS y0,
        |    first_value(t IGNORE NULLS) OVER wn AS t1,
        |    first_value(y IGNORE NULLS) OVER wn AS y1
        |  FROM m WINDOW
        |    wp AS (PARTITION BY user_id ORDER BY tm, kind
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY user_id ORDER BY tm, kind
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, hr,
        |  CAST(CASE WHEN t0 IS NULL THEN y1 WHEN t1 IS NULL THEN y0
        |    WHEN t1 = t0 THEN y0
        |    ELSE y0*(t1-t0) + (y1-y0)*(tm-t0) END AS BIGINT) AS num,
        |  CAST(CASE WHEN t0 IS NULL OR t1 IS NULL OR t1 = t0 THEN 1
        |    ELSE t1-t0 END AS BIGINT) AS den
        |FROM w WHERE kind = 1 ORDER BY user_id, hr""".stripMargin,

    // q235: ranks re-derived as row_number over the identical total
    // orders; same decimal sufficient stats, same final IEEE tree.
    "q235_spearman" ->
      s"""WITH j AS (SELECT o.o_orderkey AS ok,
        |    CAST(round(o.o_totalprice*100) AS BIGINT) AS x,
        |    CAST(round(c.c_acctbal*100) AS BIGINT) AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |r AS (SELECT ok,
        |    row_number() OVER (ORDER BY x, ok) AS rx,
        |    row_number() OVER (ORDER BY y, ok) AS ry FROM j),
        |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
        |    sum(CAST(rx AS HUGEINT) * ry) AS sxy,
        |    sum(CAST(rx AS HUGEINT) * rx) AS sxx,
        |    sum(CAST(ry AS HUGEINT) * ry) AS syy
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |     sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS DOUBLE) AS rho
        |FROM g""".stripMargin,

    "q234_gini" ->
      s"""WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderkey AS ok,
        |    CAST(round(o.o_totalprice*100) AS BIGINT) AS x
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |r AS (SELECT seg, x,
        |    row_number() OVER (PARTITION BY seg ORDER BY x, ok) AS rn
        |  FROM j),
        |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    sum(CAST(rn AS HUGEINT) * x) AS srx
        |  FROM r GROUP BY seg)
        |SELECT seg, n, sx,
        |  CAST((2 * srx - (n + 1) * CAST(sx AS HUGEINT)) * 1000000
        |    // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS gini_ppm
        |FROM g ORDER BY seg""".stripMargin,

    "q232_consistent_hashing" -> {
      val ringPos = Q.uhashSql("23200", "(s.range * 1000 + v.range)")
      val keyHash = Q.uhashSql("23201", "(user_id % 4294967291)")
      s"""WITH ring AS (SELECT s.range AS s, v.range AS v, $ringPos AS pos
        |  FROM range(5) s, range(64) v),
        |kh AS (SELECT user_id, $keyHash AS kh
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |d AS (SELECT k.user_id, r.s, r.v,
        |    ((r.pos - k.kh) % 4294967291 + 4294967291) % 4294967291 AS d
        |  FROM kh k CROSS JOIN ring r),
        |b AS (SELECT user_id, s AS shard_before FROM d WHERE s <= 3
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY d, s, v) = 1),
        |a AS (SELECT user_id, s AS shard_after FROM d
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY d, s, v) = 1)
        |SELECT b.shard_before, a.shard_after,
        |  CAST(count(*) AS BIGINT) AS n_keys
        |FROM b JOIN a USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q233_quota_allocation" ->
      s"""WITH w AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |t AS (SELECT SUM(w) AS wt FROM w),
        |b AS (SELECT lang, w,
        |    10000 * CAST(w AS HUGEINT) // wt AS base,
        |    (10000 * CAST(w AS HUGEINT)) % wt AS rem
        |  FROM w CROSS JOIN t),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |    10000 - SUM(base) OVER () AS left_units FROM b)
        |SELECT lang, w, CAST(base AS BIGINT) AS base,
        |  CAST(CASE WHEN rk <= left_units THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(base + CASE WHEN rk <= left_units THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM r ORDER BY lang""".stripMargin,

    "q230_benford_audit" ->
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice*100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        |t AS (SELECT SUM(n) AS tot FROM g),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) ex(digit, expected_ppm))
        |SELECT g.digit, g.n,
        |  CAST(g.n * 1000000 // t.tot AS BIGINT) AS observed_ppm,
        |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        |  CAST(abs(g.n * 1000000 // t.tot - e.expected_ppm) AS BIGINT) AS dev_ppm,
        |  CAST(CASE WHEN abs(g.n * 1000000 // t.tot - e.expected_ppm) > 10000
        |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM g CROSS JOIN t JOIN e ON e.digit = g.digit
        |ORDER BY g.digit""".stripMargin,

    // q231: the oracle runs the NAIVE global sweep (one window over
    // every boundary); the Spark plan's within-hour prefix + tiny
    // hour-table carry equals it exactly because hour boundaries
    // align with the sweep order.
    "q231_peak_concurrency" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts_ns) OVER w IS NULL
        |    OR ts_ns - lag(ts_ns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS nsess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns)),
        |g AS (SELECT *, sum(nsess) OVER (PARTITION BY user_id ORDER BY ts_ns
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m),
        |sess AS (SELECT user_id, sid, min(ts_ns) AS s, max(ts_ns) AS en
        |  FROM g GROUP BY 1, 2),
        |b AS (SELECT s AS ts, 1 AS delta FROM sess
        |  UNION ALL SELECT en, -1 FROM sess),
        |r AS (SELECT ts, delta, ts // 3600000000000 AS hour,
        |    sum(delta) OVER (ORDER BY ts, delta DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM b)
        |SELECT hour,
        |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |  CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
        |  CAST(max(run) AS BIGINT) AS peak
        |FROM r GROUP BY hour ORDER BY hour""".stripMargin,

    "q229_snapshot_diff" ->
      s"""WITH ev AS (SELECT event_id,
        |    CAST(round(value*100) AS BIGINT) AS c FROM events),
        |v1 AS (SELECT event_id, c AS c1 FROM ev WHERE event_id % 11 <> 5),
        |v2 AS (SELECT event_id,
        |    c + CASE WHEN event_id % 7 = 0 THEN 100 ELSE 0 END AS c2
        |  FROM ev WHERE event_id % 13 <> 2),
        |d AS (
        |  SELECT CASE WHEN v1.event_id IS NULL THEN 'added'
        |              WHEN v2.event_id IS NULL THEN 'removed'
        |              WHEN v1.c1 <> v2.c2 THEN 'changed'
        |              ELSE 'unchanged' END AS category,
        |    COALESCE(v2.c2, 0) - COALESCE(v1.c1, 0) AS delta_c
        |  FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id)
        |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(delta_c) AS BIGINT) AS net_delta_c
        |FROM d GROUP BY category ORDER BY category""".stripMargin,

    "q228_kmv_sketch" -> {
      val uh = Q.uhashSql("22800", "(user_id % 4294967291)")
      s"""WITH ut AS (SELECT DISTINCT event_type AS t, user_id FROM events),
        |h AS (SELECT DISTINCT t, $uh AS h FROM ut),
        |kmv AS (SELECT t, h,
        |    row_number() OVER (PARTITION BY t ORDER BY h) AS rk
        |  FROM h QUALIFY rk <= 64),
        |est AS (SELECT t, 63 * 4294967291 // h AS est FROM kmv WHERE rk = 64),
        |types AS (SELECT DISTINCT t FROM kmv),
        |pairs AS (SELECT a.t AS ta, b.t AS tb FROM types a, types b WHERE a.t < b.t),
        |mh AS (SELECT DISTINCT p.ta, p.tb, k.h
        |  FROM pairs p JOIN kmv k ON k.t = p.ta OR k.t = p.tb),
        |mu AS (SELECT ta, tb, h,
        |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rk FROM mh),
        |eu AS (SELECT ta, tb, 63 * 4294967291 // h AS est_union
        |  FROM mu WHERE rk = 64),
        |ex AS (SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS exact_inter
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT eu.ta, eu.tb, ea.est AS est_a, eb.est AS est_b, eu.est_union,
        |  ea.est + eb.est - eu.est_union AS est_inter, ex.exact_inter
        |FROM eu JOIN est ea ON ea.t = eu.ta JOIN est eb ON eb.t = eu.tb
        |JOIN ex ON ex.ta = eu.ta AND ex.tb = eu.tb
        |ORDER BY eu.ta, eu.tb""".stripMargin
    },

    "q226_compact_files" -> {
      val rs = "concat_ws('|', event_id, user_id, event_type, " +
        "CAST(round(value*100) AS BIGINT))"
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(${Q.polyHashSql(rs)}) AS BIGINT) AS checksum,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c,
        |  CAST(64 AS BIGINT) AS files_small,
        |  CAST((count(*) + 24999) // 25000 AS BIGINT) AS files_packed
        |FROM events""".stripMargin
    },

    "q224_hll_registers" -> {
      val uh = Q.uhashSql("22400", "(user_id % 4294967291)")
      s"""WITH h AS (SELECT $uh AS h FROM events),
        |r AS (SELECT h % 256 AS reg, ${rhoCase("h // 256")} AS rho FROM h),
        |regs AS (SELECT reg, MAX(rho) AS rho FROM r GROUP BY reg),
        |allr AS (SELECT g.range AS reg, COALESCE(regs.rho, 0) AS rho
        |  FROM range(256) g LEFT JOIN regs ON regs.reg = g.range),
        |est AS (SELECT 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 /
        |    SUM(1.0 / CAST((1 << rho) AS DOUBLE)) AS v FROM allr)
        |SELECT CAST(reg AS BIGINT) AS reg, CAST(rho AS DOUBLE) AS v FROM allr
        |UNION ALL SELECT -1, v FROM est
        |UNION ALL SELECT -2, CAST(count(DISTINCT user_id) AS DOUBLE) FROM events
        |ORDER BY reg""".stripMargin
    },

    "q213_ab_test" -> {
      val uh = Q.uhashSql("21300", "(user_id % 4294967291)")
      s"""WITH pu AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    $uh % 2 AS arm
        |  FROM events GROUP BY user_id),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n_c,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS HUGEINT) AS cv_c,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_t,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS HUGEINT) AS cv_t
        |  FROM pu),
        |x AS (SELECT n_c, cv_c, n_t, cv_t,
        |    cv_t AS a, n_t - cv_t AS b, cv_c AS c, n_c - cv_c AS d FROM t),
        |y AS (SELECT n_c, cv_c, n_t, cv_t,
        |    (a + b + c + d) * (a*d - b*c) * (a*d - b*c) AS num,
        |    (a + b) * (c + d) * (a + c) * (b + d) AS den
        |  FROM x)
        |SELECT CAST(n_c AS BIGINT) AS n_control, CAST(cv_c AS BIGINT) AS conv_control,
        |  CAST(n_t AS BIGINT) AS n_treat, CAST(cv_t AS BIGINT) AS conv_treat,
        |  CAST(num AS VARCHAR) AS chi2_num, CAST(den AS VARCHAR) AS chi2_den,
        |  CAST(CASE WHEN den <> 0 AND num * 100 > den * 384 THEN 1 ELSE 0 END
        |    AS BIGINT) AS significant
        |FROM y""".stripMargin
    },

    // The stream's restart-recovered answer converges to the plain
    // batch aggregate — which is exactly what the oracle computes.
    "q215_stream_resume" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q216_twap" ->
      """WITH o AS (SELECT user_id, epoch_ns(ts) AS ns, event_id,
        |    CAST(round(value*100) AS BIGINT) AS c,
        |    lead(epoch_ns(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS nxt
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
        |  CAST(sum(c * ((nxt - ns) // 1000000000)) AS BIGINT) AS twap_num,
        |  CAST(sum((nxt - ns) // 1000000000) AS BIGINT) AS twap_den
        |FROM o WHERE nxt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q220_ttl_purge_plan" ->
      """WITH mx AS (SELECT max(epoch_ns(ts)) AS m FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c,
        |  CAST(sum(length(props)) AS BIGINT) AS payload_bytes
        |FROM events, mx
        |WHERE epoch_ns(ts) < mx.m - 604800000000000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q218_group_kfold" -> {
      val uh = Q.uhashSql("21800", "(user_id % 4294967291)")
      s"""WITH ev AS (SELECT user_id, event_type, $uh % 5 AS fold FROM events),
        |pf AS (SELECT fold, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_purchases
        |  FROM ev GROUP BY fold),
        |au AS (SELECT CAST(-1 AS BIGINT) AS fold,
        |    CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
        |    CAST(0 AS BIGINT) AS n_events, CAST(0 AS BIGINT) AS n_purchases
        |  FROM (SELECT user_id, count(DISTINCT fold) AS nf FROM ev GROUP BY user_id))
        |SELECT CAST(fold AS BIGINT) AS fold, n_users, n_events, n_purchases FROM pf
        |UNION ALL SELECT fold, n_users, n_events, n_purchases FROM au
        |ORDER BY fold""".stripMargin
    },

    "q219_lateness_profile" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ns,
        |    epoch_ns(ts) // 3600000000000 AS hour,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |l AS (SELECT user_id, ns,
        |    max(ns) OVER (PARTITION BY user_id ORDER BY hour, k, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM e),
        |lt AS (SELECT greatest(coalesce(hwm - ns, 0), 0) AS late_ns FROM l),
        |bk AS (SELECT late_ns,
        |    CASE WHEN late_ns = 0 THEN 0
        |         WHEN late_ns < 60000000000 THEN 1
        |         WHEN late_ns < 600000000000 THEN 2
        |         WHEN late_ns < 3600000000000 THEN 3
        |         ELSE 4 END AS bucket
        |  FROM lt)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(late_ns) AS BIGINT) AS max_late_ns,
        |  CAST(sum(late_ns // 1000000000) AS BIGINT) AS late_s_sum
        |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q217_incremental_sessions" ->
      """WITH bd AS (SELECT min(epoch_ns(ts)) +
        |    (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS b FROM events),
        |e AS (SELECT user_id, epoch_ns(ts) AS ns, event_id,
        |    CASE WHEN epoch_ns(ts) < bd.b THEN 0 ELSE 1 END AS h
        |  FROM events, bd),
        |marks AS (SELECT user_id, h, ns,
        |    CASE WHEN lag(ns) OVER wh IS NULL
        |      OR ns - lag(ns) OVER wh > 1800000000000 THEN 1 ELSE 0 END AS fresh
        |  FROM e WINDOW wh AS (PARTITION BY user_id, h ORDER BY ns, event_id)),
        |sess AS (SELECT user_id, h, ns,
        |    sum(fresh) OVER (PARTITION BY user_id, h ORDER BY ns
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marks),
        |sg AS (SELECT user_id, h, sid, min(ns) AS sb, max(ns) AS se
        |  FROM sess GROUP BY 1, 2, 3),
        |astat AS (SELECT user_id, CAST(count(*) AS BIGINT) AS na,
        |    max(se) AS last_end FROM sg WHERE h = 0 GROUP BY 1),
        |bstat AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nb,
        |    min(sb) AS first_start FROM sg WHERE h = 1 GROUP BY 1),
        |mg AS (SELECT coalesce(astat.user_id, bstat.user_id) AS user_id,
        |    coalesce(na, 0) + coalesce(nb, 0) -
        |      CASE WHEN last_end IS NOT NULL AND first_start IS NOT NULL
        |        AND first_start - last_end <= 1800000000000 THEN 1 ELSE 0 END
        |      AS n_merged,
        |    CAST(CASE WHEN last_end IS NOT NULL AND first_start IS NOT NULL
        |      AND first_start - last_end <= 1800000000000 THEN 1 ELSE 0 END
        |      AS BIGINT) AS bridged
        |  FROM astat FULL OUTER JOIN bstat ON astat.user_id = bstat.user_id),
        |fmarks AS (SELECT user_id, ns,
        |    CASE WHEN lag(ns) OVER wf IS NULL
        |      OR ns - lag(ns) OVER wf > 1800000000000 THEN 1 ELSE 0 END AS fresh
        |  FROM e WINDOW wf AS (PARTITION BY user_id ORDER BY ns, event_id)),
        |full0 AS (SELECT user_id, CAST(sum(fresh) AS BIGINT) AS n_full,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM fmarks GROUP BY user_id)
        |SELECT full0.user_id, full0.n_full, CAST(mg.n_merged AS BIGINT) AS n_merged,
        |  mg.bridged, full0.n_events
        |FROM full0 JOIN mg ON full0.user_id = mg.user_id
        |ORDER BY full0.user_id""".stripMargin,

    "q214_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ns FROM events),
        |fv AS (SELECT user_id, min(ns) AS fv FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (SELECT ev.user_id, min(ns) AS fc FROM ev JOIN fv USING (user_id)
        |  WHERE event_type = 'click' AND ns > fv GROUP BY ev.user_id),
        |fp AS (SELECT ev.user_id, min(ns) AS fp FROM ev JOIN fc USING (user_id)
        |  WHERE event_type = 'purchase' AND ns > fc GROUP BY ev.user_id),
        |gaps AS (SELECT fv.user_id, fc.fc - fv.fv AS g, 'view_to_click' AS stage
        |    FROM fv JOIN fc USING (user_id)
        |  UNION ALL
        |  SELECT fc.user_id, fp.fp - fc.fc AS g, 'click_to_purchase' AS stage
        |    FROM fc JOIN fp USING (user_id)),
        |rk AS (SELECT stage, g,
        |    CAST(row_number() OVER (PARTITION BY stage ORDER BY g, user_id)
        |      AS BIGINT) - 1 AS rk,
        |    CAST(count(*) OVER (PARTITION BY stage) AS BIGINT) AS n
        |  FROM gaps)
        |SELECT stage, CAST(max(n) AS BIGINT) AS n_users,
        |  CAST(min(CASE WHEN rk = (n - 1) // 2 THEN g END) AS BIGINT) AS median_lo,
        |  CAST(min(CASE WHEN rk = n // 2 THEN g END) AS BIGINT) AS median_hi,
        |  CAST(min(CASE WHEN rk = ((n - 1) * 9) // 10 THEN g END) AS BIGINT) AS p90
        |FROM rk WHERE rk = (n - 1) // 2 OR rk = n // 2 OR rk = ((n - 1) * 9) // 10
        |GROUP BY stage ORDER BY stage""".stripMargin,

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
