package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 pack: sequence/pattern analytics. q243 is the
  * MATCH_RECOGNIZE shape (SQL:2016 row-pattern matching; Flink CEP's
  * bread and butter) expressed Spark-first: per-anchor strict
  * sequences with per-step time bounds, found with ONE per-user
  * sort + running-frame windows (the q211 reversed-sort O(n) plan)
  * plus one unique-key equi-join — never a state-machine UDF, never
  * a pair join, never a shrinking frame. */
object AnalyticsQueries8 extends QueryPack {
  import Q.Fn

  val queries = Map[String, Fn](

    // TIME-BOUNDED SEQUENCE MATCH (MATCH_RECOGNIZE / funnel-instance
    // shape): every view → its FIRST following click (≤ 24 h) →
    // that click's FIRST following purchase (≤ 24 h), per user,
    // "following" = strictly later in the (ts_ns, event_id) total
    // order. Unlike q214 (per-user FIRST-event stage latencies) this
    // matches EVERY anchor, so one user can contribute many
    // instances. Plan: one window pass computes, at every row, the
    // first following click and first following purchase as
    // lexicographic struct-mins over the reversed-sort RUNNING frame
    // (O(n) per user; the current row is excluded by its own kind
    // guard — a click contributes null to the purchase-min and vice
    // versa). A view then carries its click id, and the purchase leg
    // is read off the CLICK row via a unique-key join on c_id (event
    // ids are unique; the persist keeps the windowed timeline from
    // being sorted twice — at 100 TB scale the same plan co-keys
    // both sides by event id, a plain hash join with no pair
    // amplification: |views| + |clicks| rows, never views×clicks).
    "q243_seq_match" -> { (s, dir) =>
      val lim = 86400L * 1000000000L // 24 h per step, ns
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type").as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val marked = ev
        .withColumn("nc", min(when(col("kind") === "click",
          struct(col("ts_ns"), col("event_id")))).over(w))
        .withColumn("np", min(when(col("kind") === "purchase",
          struct(col("ts_ns"), col("event_id")))).over(w))
        .persist()
      val views = marked.filter(col("kind") === "view")
        .filter(col("nc").isNotNull && col("nc.ts_ns") <= col("ts_ns") + lim)
        .select(col("user_id"), col("event_id").as("v_id"),
          col("ts_ns").as("v_ts"), col("nc.event_id").as("c_id"),
          col("nc.ts_ns").as("c_ts"))
      val clicks = marked.filter(col("kind") === "click")
        .select(col("event_id").as("c_id"),
          col("np.ts_ns").as("p_ts"), col("np.event_id").as("p_id"))
      views.join(clicks, Seq("c_id"))
        .filter(col("p_id").isNotNull && col("p_ts") <= col("c_ts") + lim)
        .select(col("user_id"), col("v_id"), col("c_id"), col("p_id"),
          expr("(p_ts - v_ts) DIV 1000000000").as("v_to_p_s"))
        .orderBy(col("user_id"), col("v_id"))
    },

    // EXACT-DEDUP-FIRST FUZZY MATCHING — the documented 100 TB
    // composition for the quadratic blocked-pair family (q25/q196),
    // now a first-class operator instead of prose: collapse exact
    // duplicates (md5 group → min-id representative + group size n)
    // BEFORE the blocked banded-levenshtein join, then emit
    // representative near-dup edges carrying (n_a, n_b). q196's raw
    // output is exactly recoverable — each edge stands for n_a·n_b
    // raw cross-group pairs (identical texts share every prefix
    // byte) and each group adds n·(n−1)/2 internal dist-0 pairs —
    // but the PAIR JOIN only ever sees distinct texts, so a corpus
    // that is k× exact-duplicated pays k² fewer candidate pairs
    // (measured on the 5×-exact-dup rung: see ARCHITECTURE.md
    // "Dedup composition"). The md5 group-shuffle moves 16-byte
    // fingerprints, never text.
    "q244_dedup_compose" -> { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
      val fp = docs.select(col("doc_id"), col("lang"), col("text"),
        md5(col("text")).as("fp"))
      val g = fp.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("rid"), count(lit(1)).as("n"))
      val reps = fp.join(g, fp("doc_id") === g("rid"))
        .select(col("rid").as("doc_id"), col("n"), col("lang"),
          split(col("text"), " ").getItem(0).as("t1"),
          substring(col("text"), 1, 40).as("p"))
      val a = reps.select(col("doc_id").as("id_a"), col("n").as("n_a"),
        col("lang"), col("t1"), col("p").as("pa"))
      val b = reps.select(col("doc_id").as("id_b"), col("n").as("n_b"),
        col("lang"), col("t1"), col("p").as("pb"))
      a.join(b, Seq("lang", "t1"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("pa"), col("pb"), 15).cast("long").as("dist"),
          col("n_a"), col("n_b"),
          (col("n_a") * col("n_b")).as("pair_mult"))
        .filter(col("dist") >= 0 && col("dist") <= 15)
        .orderBy(col("id_a"), col("id_b"))
    },

    // QUANTIFIED ROW PATTERN (A{3,} B — "click burst then buy"):
    // maximal runs of ≥3 CONSECUTIVE clicks (consecutive in the
    // user's full event stream — gaps-and-islands via the rn − rn_kind
    // difference, a shape no other query here uses), each annotated
    // with the first purchase ≤ 24 h after the run's end. Because an
    // island contains no non-click events by construction, every row
    // of a run sees the SAME next purchase — so the run's purchase is
    // a plain max() of the per-row next-purchase struct (computed on
    // the O(n) reversed-sort running frame, q211 policy) and the whole
    // match is ONE partition-sort + one hash agg: no self-join, no
    // state machine, no per-run re-scan. At 100 TB everything
    // partitions by user_id; run count ≤ event count.
    "q245_click_runs" -> { (s, dir) =>
      val lim = 86400L * 1000000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type").as("kind"))
      val wAsc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val wKind = Window.partitionBy(col("user_id"), col("kind"))
        .orderBy(col("ts_ns"), col("event_id"))
      val wDesc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = ev
        .withColumn("rn", row_number().over(wAsc))
        .withColumn("rnk", row_number().over(wKind))
        .withColumn("np", min(when(col("kind") === "purchase",
          struct(col("ts_ns"), col("event_id")))).over(wDesc))
        .filter(col("kind") === "click")
        .groupBy(col("user_id"), (col("rn") - col("rnk")).as("isl"))
        .agg(count(lit(1)).as("run_len"),
          min_by(col("event_id"), struct(col("ts_ns"), col("event_id"))).as("s_id"),
          max_by(col("event_id"), struct(col("ts_ns"), col("event_id"))).as("e_id"),
          min(col("ts_ns")).as("s_ts"), max(col("ts_ns")).as("e_ts"),
          max(col("np")).as("np"))
        .filter(col("run_len") >= 3)
      val hit = col("np").isNotNull && col("np.ts_ns") <= col("e_ts") + lim
      runs.select(col("user_id"), col("s_id"), col("e_id"), col("run_len"),
        expr("(e_ts - s_ts) DIV 1000000000").as("span_s"),
        when(hit, col("np.event_id")).otherwise(lit(-1L)).as("p_id"),
        when(hit, expr("(np.ts_ns - e_ts) DIV 1000000000"))
          .otherwise(lit(-1L)).as("p_lat_s"))
        .orderBy(col("user_id"), col("s_id"))
    },

    // COHORT RETENTION TRIANGLE — the RATIO readout q169 stops short
    // of: q169 counts active users per (first-activity cohort,
    // offset); this cohorts on an explicit qualifying event (first
    // `signup` — activity before signup exists and must NOT create a
    // cohort), attaches each cohort's SIZE, and emits retention ppm —
    // the normalized triangle dashboards actually plot. Planned for
    // scale: the
    // (user, week) activity grid partial-aggregates map-side before
    // its one shuffle, the cohort attach is a co-keyed join on
    // user_id (never a broadcast of an unbounded user dim), and the
    // final agg is over the tiny (cohort, offset) grid. ret_ppm stays
    // BIGINT: n_active·10⁶ wraps only past 9.2e12 users.
    "q246_cohort_retention" -> { (s, dir) =>
      val wkNs = 604800000000000L // 7 * 86400 * 1e9
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ns DIV ${wkNs}L").as("wk"),
          col("event_type"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val active = ev.select(col("user_id"), col("wk")).distinct()
      val grid = active.join(cohort, Seq("user_id"))
        .filter(col("wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = cohort.groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_n"))
      grid.join(sizes, Seq("cohort_wk"))
        .select(col("cohort_wk"), col("wk_offset"), col("n_active"), col("cohort_n"),
          expr("n_active * 1000000 DIV cohort_n").as("ret_ppm"))
        .orderBy(col("cohort_wk"), col("wk_offset"))
    },

    // TOKENIZER VOCABULARY + OOV AUDIT: build the frequency-cutoff
    // vocabulary (global token count ≥ 10 — the tokenizer-training
    // min_frequency knob) and report, per source, token volume and
    // the out-of-vocabulary rate a tokenizer trained at that cutoff
    // would pay. Plan: per-(doc,token) counts partial-aggregate
    // map-side, the global counts are ONE shuffle by token, and the
    // OOV flag rides the SAME token-keyed exchange as a co-keyed
    // join — the vocabulary is never collected or broadcast (at
    // 100 TB it has billions of entries). Tokenization matches q209's
    // proven whitespace split exactly.
    "q247_vocab_oov" -> { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), col("source"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("k"))
      val global = toks.groupBy(col("tok")).agg(sum(col("k")).as("gf"))
      val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      toks.join(global, Seq("tok"))
        .groupBy(col("source"))
        .agg(sum(col("k")).as("n_tokens"),
          sum(when(col("gf") < 10, col("k")).otherwise(lit(0L))).as("n_oov"),
          count_distinct(when(col("gf") >= 10, col("tok"))).as("n_vocab_src"))
        .join(nd, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_oov"),
          col("n_vocab_src"),
          expr("n_oov * 1000000 DIV n_tokens").as("oov_ppm"))
        .orderBy(col("source"))
    },

    // PIVOT WITH CATCH-ALL BUCKET: q152 pivots a CLOSED enum (langs)
    // with an explicit value list; this is the open-domain variant —
    // the pivot axis (source) is unbounded in production, so the
    // named columns are a fixed shortlist and everything else folds
    // into `other` BEFORE the pivot. That pre-fold is what keeps an
    // explicit-list pivot correct on an open domain (a bare explicit
    // list silently DROPS unlisted values); the plan stays one
    // conditional-aggregate pass, no collect-distinct pre-scan.
    "q248_source_pivot" -> { (s, dir) =>
      val named = Seq("src1", "src2", "src3", "src4")
      Tables.table(s, dir, "documents")
        .select(col("lang"),
          when(col("source").isin(named.map(lit): _*), col("source"))
            .otherwise(lit("other")).as("src"),
          col("n_chars"))
        .groupBy(col("lang"))
        .pivot("src", named :+ "other")
        .agg(sum(col("n_chars")))
        .na.fill(0L, named :+ "other")
        .orderBy(col("lang"))
    },

    // SESSION PATH TRIGRAMS: the 10 most common 3-step event-type
    // sequences inside 30-minute-gap sessions ("path analysis").
    // q177 mines trigrams over each user's WHOLE timeline; the
    // session boundary here changes the answer (a path must not span
    // a session break) and the plan point is that enforcing it costs
    // ZERO extra shuffles — the sid guard rides the same sort.
    // Session ids come from the running gap-sum; the trigram is
    // assembled with lead() on the SAME user-partitioned sort — the
    // within-session guard is lead(sid, 2) = sid, so no second
    // (user, session)-keyed shuffle ever happens. One sort, one hash
    // agg, one TakeOrdered(10): at 100 TB the trigram key space is
    // |types|³ = tiny, so the final agg is a few rows per executor.
    "q249_session_paths" -> { (s, dir) =>
      val gap = 1800L * 1000000000L
      val wAsc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val wRun = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type").as("kind"))
        .withColumn("prev", lag(col("ts_ns"), 1).over(wAsc))
        .withColumn("fresh",
          when(col("prev").isNull || col("ts_ns") - col("prev") > gap, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("fresh")).over(wRun))
        .withColumn("k1", lead(col("kind"), 1).over(wAsc))
        .withColumn("k2", lead(col("kind"), 2).over(wAsc))
        .withColumn("s2", lead(col("sid"), 2).over(wAsc))
        .filter(col("s2") === col("sid"))
        .select(concat_ws(">", col("kind"), col("k1"), col("k2")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(10)
    },

    // ASYMMETRIC CONTAINMENT DECONTAMINATION: q83 answers "how many
    // benchmark grams does this doc share with the benchmark AS A
    // SET"; this attributes leakage per (doc, benchmark item) PAIR
    // with a containment score |grams(doc) ∩ grams(item)| / |grams
    // (item)| — the report that tells you WHICH test item leaked
    // WHERE, and catches a doc that quotes one item wholesale even
    // when globally dissimilar (symmetric Jaccard misses exactly
    // that). Plan: distinct (doc, 3-gram) on both sides, ONE
    // gram-keyed equi-join (never doc × item), per-pair count, gate
    // n_shared ≥ 3, ppm by integer DIV. At 100 TB the benchmark side
    // is eval-suite-sized, so AQE broadcasts it from runtime stats —
    // deliberately UNHINTED (round-15 hint audit: a hint forces the
    // driver build even on a vintage where the benchmark slice is
    // corpus-sized); hot grams show up in the q197 occupancy audit
    // first.
    "q252_containment_decon" -> { (s, dir) =>
      val gr = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          split(trim(col("text")), "\\s+").as("wt"))
        .select(col("doc_id"), col("source"),
          explode(when(size(col("wt")) >= 3, expr(
            "transform(sequence(0, size(wt)-3), i -> concat_ws(' ', slice(wt, i+1, 3)))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("ngram"))
        .distinct()
      val items = gr.filter(col("source") === "src0")
        .select(col("doc_id").as("item_id"), col("ngram"))
      val itemN = items.groupBy(col("item_id")).agg(count(lit(1)).as("n_item"))
      gr.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("ngram"))
        .join(items, Seq("ngram"))
        .groupBy(col("doc_id"), col("item_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .join(itemN, Seq("item_id"))
        .select(col("doc_id"), col("item_id"), col("n_shared"), col("n_item"),
          expr("n_shared * 1000000 DIV n_item").as("contain_ppm"))
        .orderBy(col("doc_id"), col("item_id"))
    },

    // HYBRID RETRIEVAL FUSION (RRF): the modern two-tower search
    // readout — a lexical top-20 (docs ranked by how many of the four
    // query terms they contain, shortest doc first: exact integers)
    // fused with a semantic top-20 (q88's int8-quantized exact-long
    // dot against corpus vector 0) by reciprocal-rank fusion. The RRF
    // constant 60 is folded into an INTEGER score: rrf_scaled =
    // Σ 10¹² DIV (60 + rank) — both engines compute the same integer,
    // no float path anywhere in the fusion. Each leg is a
    // TakeOrdered(20) (no global window over the corpus); the fusion
    // itself is a 20∪20-row full outer join — driver-scale by
    // construction, whatever the corpus size.
    "q253_hybrid_rrf" -> { (s, dir) =>
      val terms = Seq("table", "join", "window", "stream")
      val lex = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("wt"))
        .select(col("doc_id"), size(col("wt")).cast("long").as("dl"),
          terms.map(t => when(array_contains(col("wt"), t), 1L).otherwise(0L))
            .reduce(_ + _).as("n_hit"))
        .filter(col("n_hit") >= 1)
        .orderBy(col("n_hit").desc, col("dl"), col("doc_id"))
        .limit(20)
        .withColumn("rank_lex", row_number().over(
          Window.orderBy(col("n_hit").desc, col("dl"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank_lex"))
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
        .withColumn("mx", aggregate(col("vd"), lit(0.0), (a, x) => greatest(a, abs(x))))
        .withColumn("qarr", transform(col("vd"), x =>
          when(col("mx") === 0.0, lit(0L))
            .otherwise(round(x * 127.0 / col("mx")).cast("long"))))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("qarr").as("query_v"))
      val sem = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("dot_q",
          aggregate(zip_with(col("query_v"), col("qarr"), (x, y) => x * y),
            lit(0L), (acc, v) => acc + v))
        .orderBy(col("dot_q").desc, col("vec_id"))
        .limit(20)
        .withColumn("rank_sem", row_number().over(
          Window.orderBy(col("dot_q").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("rank_sem"))
      lex.join(sem, Seq("doc_id"), "fullOuter")
        .select(col("doc_id"),
          coalesce(col("rank_lex"), lit(-1L)).as("rank_lex"),
          coalesce(col("rank_sem"), lit(-1L)).as("rank_sem"),
          (coalesce(expr("1000000000000 DIV (60 + rank_lex)"), lit(0L)) +
            coalesce(expr("1000000000000 DIV (60 + rank_sem)"), lit(0L)))
            .as("rrf_scaled"))
        .orderBy(col("rrf_scaled").desc, col("doc_id"))
    },

    // SEEDED NEGATIVE SAMPLING for contrastive training: per sampled
    // customer, k=10 parts they did NOT buy, drawn by the oracled
    // universal hash family (candidate j ↦ part uhash(j, custkey) mod
    // |parts|, j = 0..29) and anti-joined against their positives —
    // the (anchor, negative) pair generator every embedding trainer
    // needs, with NO randomness source (re-runs and both engines
    // agree). Plan: candidates are generated IN-ROW (explode over a
    // 30-element sequence), the positive check is one co-keyed
    // (customer, part) anti join, survivor rank = candidate index —
    // linear in customers, no corpus-sized broadcast, no RNG state.
    // Collisions dedup to the smallest j; customers keep < k
    // negatives only if > 20 of 30 candidates hit positives.
    "q254_negative_sampling" -> { (s, dir) =>
      val nPartsDf = Tables.table(s, dir, "part")
        .agg((max(col("p_partkey")) + 1).as("np"))
      val pos = Tables.table(s, dir, "orders")
        .join(Tables.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
        .distinct()
      val cands = Tables.table(s, dir, "customer")
        .filter(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("custkey"))
        .crossJoin(broadcast(nPartsDf))
        .select(col("custkey"), explode(expr(
          """transform(sequence(0, 29), j -> struct(CAST(j AS BIGINT) AS j,
            |  ((((j*2654435761 % 1073741824)*2+1) * (custkey % 4294967291) +
            |    (j*40503+778797) % 1073741824) % 4294967291) % np AS partkey))"""
            .stripMargin)).as("c"))
        .select(col("custkey"), col("c.j").as("j"), col("c.partkey").as("partkey"))
        .groupBy(col("custkey"), col("partkey")).agg(min(col("j")).as("j"))
      val w = Window.partitionBy(col("custkey")).orderBy(col("j"))
      cands.join(pos, Seq("custkey", "partkey"), "leftAnti")
        .withColumn("neg_rank", row_number().over(w).cast("long"))
        .filter(col("neg_rank") <= 10)
        .select(col("custkey"), col("neg_rank"), col("partkey"))
        .orderBy(col("custkey"), col("neg_rank"))
    },

    // JOHNSON-LINDENSTRAUSS RANDOM PROJECTION, audited: the
    // dimensionality-reduction lever between full-precision scan
    // (q27/q88) and PQ (q78) — project the int8-quantized 64-dim
    // corpus to 16 dims through a FIXED ±1 sign matrix (generated
    // once in the driver from a deterministic recurrence and embedded
    // as literals in BOTH engines, so the projection is exact integer
    // arithmetic end to end), then rank by the 16-dim dot and report,
    // for the exact top-10, whether the projected index would have
    // found each hit. 4× fewer multiplies and 4× less residency per
    // scan row; the audit column IS the recall measurement (the
    // q131 pattern). Projection is array-local per row — the corpus
    // never shuffles; the query row is a 1-row broadcast.
    "q255_random_projection" -> { (s, dir) =>
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
        .withColumn("mx", aggregate(col("vd"), lit(0.0), (a, x) => greatest(a, abs(x))))
        .withColumn("qarr", transform(col("vd"), x =>
          when(col("mx") === 0.0, lit(0L))
            .otherwise(round(x * 127.0 / col("mx")).cast("long"))))
        .select(col("vec_id"), col("qarr"))
      def projected(df: org.apache.spark.sql.DataFrame) =
        Q.jlSigns.zipWithIndex.foldLeft(df) { case (d, (row, i)) =>
          d.withColumn(s"p$i",
            aggregate(zip_with(col("qarr"), typedLit(row), (v, sg) => v * sg),
              lit(0L), (a, x) => a + x))
        }
      val qrow = projected(emb.filter(col("vec_id") === 0))
        .select(col("qarr").as("qv") +:
          Q.jlSigns.indices.map(i => col(s"p$i").as(s"qp$i")): _*)
      val scored = projected(emb.filter(col("vec_id") =!= 0))
        .crossJoin(broadcast(qrow))
        .withColumn("dot64",
          aggregate(zip_with(col("qv"), col("qarr"), (x, y) => x * y),
            lit(0L), (a, v) => a + v))
        .withColumn("dot16",
          Q.jlSigns.indices.map(i => col(s"qp$i") * col(s"p$i"))
            .reduce(_ + _))
        .select(col("vec_id").as("cid"), col("dot64"), col("dot16"))
      val exact = scored.orderBy(col("dot64").desc, col("cid")).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("dot64").desc, col("cid"))).cast("long"))
      val proj = scored.orderBy(col("dot16").desc, col("cid")).limit(10)
        .select(col("cid"), lit(1L).as("in_proj"))
      exact.join(proj, Seq("cid"), "left")
        .select(col("rank"), col("cid"), col("dot64"), col("dot16"),
          coalesce(col("in_proj"), lit(0L)).as("in_proj_top10"))
        .orderBy(col("rank"))
    },

    // AMS (Tug-of-War) SECOND-MOMENT SKETCH, audited: F₂ = Σ_k c_k²
    // — the join/self-join size and skew statistic (q201 estimates a
    // specific join's output; F₂ is the key-distribution moment
    // behind it). Each of 8 estimators keeps ONE counter: the signed
    // sum Σ s_r(user)·(count of that user) = one ±1 per EVENT, so
    // the whole sketch is an 8-lane explode + one 8-group sum —
    // mergeable, O(1) state, map-side partial. Its square estimates
    // F₂ unbiasedly; the row shows each estimator NEXT TO the exact
    // moment (computed the expensive groupBy-user way), signed error
    // included — the q105/q205 estimate-beside-exact contract.
    // Squares and the exact sum are widened to DECIMAL(38,0) BEFORE
    // aggregation (the q235 overflow policy: sum_r² clears 2⁶³ once
    // event counts pass ~3e9) and SHIPPED AS EXACT INTEGER STRINGS
    // (the q192/q213 exact-rational policy): q256 was the only query
    // of 258 emitting DECIMAL columns in its final schema, and two
    // rounds of identical-locally/red-at-the-driver hash mismatches
    // isolated decimal canonicalization — not the arithmetic — as
    // the divergence. Strings carry the full 38-digit exactness with
    // one canonical rendering on both engines.
    "q256_ams_f2" -> { (s, dir) =>
      val p = 4294967291L
      val lanes = (0 until 8).map { r =>
        val (a, b) = graft.operators.Dedup.affine(25600 + r)
        struct(lit(r.toLong).as("r"), lit(a).as("ha"), lit(b).as("hb"))
      }
      val ev = Tables.events(s, dir).select(col("user_id"))
      val sums = ev
        .select(explode(array(lanes: _*)).as("l"), col("user_id"))
        .select(col("l.r").as("r"),
          (lit(1L) - lit(2L) * pmod(
            pmod(col("l.ha") * pmod(col("user_id"), lit(p)) + col("l.hb"), lit(p)),
            lit(2L))).as("sgn"))
        .groupBy(col("r")).agg(sum(col("sgn")).as("sum_r"))
      // decimal(19,0) × decimal(19,0) = decimal(38,0) EXACTLY — the
      // operands widen BEFORE the multiply (q235 policy), never a
      // 64-bit product that wraps first
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("f2_exact"))
      val xr = (col("sum_r").cast("decimal(19,0)")
        * col("sum_r").cast("decimal(19,0)")).cast("decimal(38,0)")
      sums.crossJoin(broadcast(exact))
        .select(col("r"), col("sum_r"),
          xr.cast("string").as("x_r"),
          col("f2_exact").cast("string").as("f2_exact"),
          (xr - col("f2_exact")).cast("decimal(38,0)").cast("string").as("err"))
        .orderBy(col("r"))
    },

    // ATTRIBUTION-WINDOW SWEEP: view→click conversion rate under
    // THREE candidate attribution windows (1 h / 6 h / 24 h) from ONE
    // pass — the parameter-sweep pattern (q237's lane explode) that
    // answers "which window should the funnel use" without rescanning
    // per candidate. The per-view gap to its first following click is
    // computed ONCE on the reversed-sort running frame (q243's O(n)
    // machinery); the sweep is an array-local 3-lane explode of that
    // row, partial-aggregating map-side into 3 groups. A naive sweep
    // runs the funnel 3× — this is why it never has to.
    "q257_attribution_sweep" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val views = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts_ns"), col("event_id"),
          col("event_type").as("kind"))
        .withColumn("nc", min(when(col("kind") === "click",
          struct(col("ts_ns"), col("event_id")))).over(w))
        .filter(col("kind") === "view")
        .select(col("ts_ns"), col("nc.ts_ns").as("c_ts"))
      views
        .select(col("ts_ns"), col("c_ts"),
          explode(typedLit(Seq(3600L, 21600L, 86400L))).as("w_s"))
        .groupBy(col("w_s"))
        .agg(count(lit(1)).as("n_views"),
          count(when(col("c_ts").isNotNull &&
            col("c_ts") <= col("ts_ns") + col("w_s") * lit(1000000000L), 1))
            .as("n_conv"))
        .select(col("w_s"), col("n_views"), col("n_conv"),
          expr("n_conv * 1000000 DIV n_views").as("cvr_ppm"))
        .orderBy(col("w_s"))
    },

    // SPAN-CORRUPTION MASK GENERATION (the T5/UL2 denoising-objective
    // data op): deterministic 3-token noise spans per document —
    // span STARTS drawn by the oracled universal hash over (doc,
    // position) at rate 1/10, overlapping spans merging into maximal
    // masked runs — with per-doc mask accounting (tokens masked,
    // distinct runs, corruption ppm). Zero RNG state: re-runs,
    // retries, and both engines produce the identical mask — the
    // property a reproducible pretraining pipeline needs from its
    // corruption pass. Plan: one posexplode + ONE per-doc window pass
    // (span membership = max(start) over [i−2, i]; run starts via
    // lag) + one hash agg — everything partitions by doc_id, windows
    // are bounded by doc length, nothing global.
    "q260_span_corruption" -> { (s, dir) =>
      val p = 4294967291L
      val (ha, hb) = graft.operators.Dedup.affine(26000)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("i", "tok")))
        .withColumn("hst", pmod(lit(ha)
          * pmod(col("doc_id") * lit(1024L) + col("i"), lit(p)) + lit(hb), lit(p)))
        .withColumn("st", when(pmod(col("hst"), lit(10L)) === 0, 1L).otherwise(0L))
        .withColumn("mk", max(col("st")).over(w.rowsBetween(-2, 0)))
        .withColumn("run_start", when(col("mk") === 1 &&
          coalesce(lag(col("mk"), 1).over(w), lit(0L)) === 0, 1L).otherwise(0L))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("mk")).as("n_masked"),
          sum(col("run_start")).as("n_runs"))
        .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_runs"),
          expr("n_masked * 1000000 DIV n_tokens").as("mask_ppm"))
        .orderBy(col("doc_id"))
    },

    // DYNAMIC PARTITION PRUNING (the star-join scale feature): q97
    // prunes with a LITERAL predicate the planner sees; here the
    // selected partitions are only knowable through a JOIN — the dim
    // carries the selection flag — so static pruning is impossible
    // and Spark must inject a runtime partition filter built from the
    // dim's broadcast result (DynamicPruningExpression on the fact
    // scan; PartitionPruningSpec asserts it and that fewer files are
    // read). At 100 TB this is the difference between scanning a
    // year-partitioned fact table wholesale and touching only the
    // partitions a filtered dimension selects — no IN-list to
    // hand-maintain. The relational answer is the plain filtered
    // aggregate the oracle runs.
    "q259_dynamic_pruning" -> { (s, dir) =>
      val root = Q.scratchDir(s, "graft_q259_dpp")
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          expr("CAST(round(value*100) AS BIGINT)").as("value_c"))
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(root + "/fact")
      // the selection flag is a STRING equality, not a bare boolean:
      // Spark's isLikelySelective() does not treat a lone boolean
      // attribute as a selective predicate (and `x = true` simplifies
      // back to one), so a boolean-flagged dim would silently get NO
      // dynamic pruning — measured in this spec before the switch
      Tables.events(s, dir).select(col("event_type")).distinct()
        .withColumn("segment",
          when(col("event_type").isin("click", "purchase"), "funnel")
            .otherwise("other"))
        .write.mode("overwrite").parquet(root + "/dim")
      val fact = s.read.parquet(root + "/fact")
      val dim = s.read.parquet(root + "/dim")
        .filter(col("segment") === "funnel")
      fact.join(broadcast(dim), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
        .orderBy(col("event_type"))
    },

    // foreachBatch IDEMPOTENT MERGE SINK: the exactly-once write
    // pattern for external stores without a transactional Spark
    // connector — per-batch latest-record compactions fold
    // associatively into a batchId-VERSIONED parquet state (a
    // replayed batch rewrites its own version from version−1, never
    // double-applies). Two ordered change-log drops; the final
    // version provably equals the q106 batch compaction. See
    // EventStream.foreachBatchMergeRollup. q130 keeps this state in
    // the ENGINE's store; this keeps it where production sinks live.
    "q258_stream_foreachbatch" -> { (s, dir) =>
      graft.streaming.EventStream.foreachBatchMergeRollup(s, dir)
    },

    // STREAMING FULL OUTER interval join — the completion of the
    // stream-stream outer-join matrix (q76 inner, q193 left): clicks
    // with no preceding-hour view AND views claimed by no following
    // click both emit exactly once on watermark passage. See
    // EventStream.fullOuterJoinRollup for the view-side hold-until-
    // released state machine and the sentinel-advanced drain that
    // makes the answer provably equal the batch FULL JOIN below.
    "q250_stream_full_outer" -> { (s, dir) =>
      graft.streaming.EventStream.fullOuterJoinRollup(s, dir)
    },

    // CHAINED STATEFUL STREAMING (stream-stream interval join → an
    // append-mode windowed aggregation in ONE query): hourly
    // attributed view volume per click hour. Exercises watermark
    // propagation BETWEEN stateful operators — the multi-stateful
    // pipeline shape single-operator queries never touch. Oracle =
    // the batch join + hourly rollup the drained stream converges to.
    "q251_stream_chain" -> { (s, dir) =>
      graft.streaming.EventStream.chainedWindowRollup(s, dir)
    },

    // EXACT-DEDUP-FIRST DECONTAMINATION — the q244 composition applied
    // to q115 (round-11 verdict task 2): md5-collapse the corpus to
    // min-id representatives + group sizes BEFORE the gram explode /
    // bloom probe / benchmark join, decontaminate representatives
    // only, emit (rep_id, n_copies, n_shared, contaminated). q115's
    // raw per-doc output is EXACTLY recoverable — identical texts have
    // identical gram sets, so every group member inherits its rep's
    // row (DeconCompositionSpec pins the expansion identity) — but
    // the gram machinery only ever sees distinct texts, so a k×
    // exact-duplicated corpus pays k× less explode, probe, and
    // shuffle (measured on the dedup rung: ARCHITECTURE.md "Dedup
    // composition"). This is the answer to q115's rung-2
    // super-linearity: output economics, not plan defect.
    "q261_decon_compose" -> { (s, dir) =>
      graft.operators.TextOps.decontaminateDedupedBloom(
          Tables.table(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "text", col("source").isin("src2"), k = 3,
          expectedItems = 1L << 17, fpp = 0.03)
        .orderBy(col("rep_id"))
    },

    // EVENT-TIME TIMERS in transformWithState (round-11 verdict task
    // 5): idle-session-timeout emission — every input batch re-arms a
    // per-user timer at last_event + 30 min, and handleExpiredTimer
    // emits the open session when the WATERMARK passes it, no further
    // event needed. The drained output is the FULL batch
    // sessionization including each user's last island — exactly the
    // rows q102's no-timer operator must leave open (its oracle drops
    // them; this one keeps them). See TwsTimeline.TimerSessionProcessor
    // for the watermark/timer ordering argument.
    "q262_tws_timers" -> { (s, dir) =>
      graft.streaming.TwsTimeline.timerSessionRollup(s, dir)
    },
  )

  // DuckDB restatement: the same total-order "first following" via a
  // strictly-FOLLOWING window frame (fine in the oracle — the O(n²)
  // frame hazard is a Spark-executor concern, not a 500-row DuckDB
  // one) over an order-preserving HUGEINT packing of (ts_ns,
  // event_id) — event ids stay far below 2^32 at every test SF, so
  // ts_ns·2^32 + id sorts exactly like the Spark struct.
  val oracle = Map(
    "q243_seq_match" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type AS kind
        |  FROM events WHERE event_type IN ('view','click','purchase')),
        |m AS (
        |  SELECT *,
        |    min(CASE WHEN kind = 'click'
        |        THEN CAST(ts_ns AS HUGEINT) * 4294967296 + event_id END)
        |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nck,
        |    min(CASE WHEN kind = 'purchase'
        |        THEN CAST(ts_ns AS HUGEINT) * 4294967296 + event_id END)
        |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS npk
        |  FROM e),
        |v AS (
        |  SELECT user_id, event_id AS v_id, ts_ns AS v_ts,
        |    CAST(nck % 4294967296 AS BIGINT) AS c_id,
        |    CAST(nck // 4294967296 AS BIGINT) AS c_ts
        |  FROM m
        |  WHERE kind = 'view' AND nck IS NOT NULL
        |    AND nck // 4294967296 <= ts_ns + 86400000000000),
        |c AS (
        |  SELECT event_id AS c_id,
        |    CAST(npk // 4294967296 AS BIGINT) AS p_ts,
        |    CAST(npk % 4294967296 AS BIGINT) AS p_id
        |  FROM m WHERE kind = 'click')
        |SELECT v.user_id, v.v_id, v.c_id, c.p_id,
        |  (c.p_ts - v.v_ts) // 1000000000 AS v_to_p_s
        |FROM v JOIN c USING (c_id)
        |WHERE c.p_id IS NOT NULL AND c.p_ts <= v.c_ts + 86400000000000
        |ORDER BY v.user_id, v.v_id""".stripMargin,

    "q244_dedup_compose" ->
      """WITH fp AS (
        |  SELECT doc_id, lang, text, md5(text) AS fp FROM documents),
        |g AS (
        |  SELECT fp, min(doc_id) AS rid, count(*) AS n FROM fp GROUP BY fp),
        |d AS (
        |  SELECT g.rid AS doc_id, g.n, f.lang,
        |    split_part(f.text, ' ', 1) AS t1, substr(f.text, 1, 40) AS p
        |  FROM g JOIN fp f ON f.doc_id = g.rid)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.p, b.p) AS dist, a.n AS n_a, b.n AS n_b,
        |  a.n * b.n AS pair_mult
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.t1 = b.t1 AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 15
        |ORDER BY id_a, id_b""".stripMargin,

    "q245_click_runs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type AS kind
        |  FROM events),
        |t AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, kind ORDER BY ts_ns, event_id) AS rnk,
        |    min(CASE WHEN kind = 'purchase'
        |        THEN CAST(ts_ns AS HUGEINT) * 4294967296 + event_id END)
        |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS npk
        |  FROM e),
        |r AS (
        |  SELECT user_id, rn - rnk AS isl, count(*) AS run_len,
        |    arg_min(event_id, CAST(ts_ns AS HUGEINT) * 4294967296 + event_id) AS s_id,
        |    arg_max(event_id, CAST(ts_ns AS HUGEINT) * 4294967296 + event_id) AS e_id,
        |    min(ts_ns) AS s_ts, max(ts_ns) AS e_ts, max(npk) AS npk
        |  FROM t WHERE kind = 'click' GROUP BY 1, 2
        |  HAVING count(*) >= 3)
        |SELECT user_id, s_id, e_id, run_len,
        |  (e_ts - s_ts) // 1000000000 AS span_s,
        |  CASE WHEN npk IS NOT NULL AND npk // 4294967296 <= e_ts + 86400000000000
        |       THEN CAST(npk % 4294967296 AS BIGINT) ELSE -1 END AS p_id,
        |  CASE WHEN npk IS NOT NULL AND npk // 4294967296 <= e_ts + 86400000000000
        |       THEN CAST((npk // 4294967296 - e_ts) // 1000000000 AS BIGINT)
        |       ELSE -1 END AS p_lat_s
        |FROM r ORDER BY user_id, s_id""".stripMargin,

    "q246_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk, event_type
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, wk FROM e),
        |g AS (SELECT cohort_wk, wk - cohort_wk AS wk_offset, count(*) AS n_active
        |  FROM a JOIN c USING (user_id) WHERE wk >= cohort_wk GROUP BY 1, 2),
        |s AS (SELECT cohort_wk, count(*) AS cohort_n FROM c GROUP BY 1)
        |SELECT cohort_wk, wk_offset, n_active, cohort_n,
        |  n_active * 1000000 // cohort_n AS ret_ppm
        |FROM g JOIN s USING (cohort_wk)
        |ORDER BY cohort_wk, wk_offset""".stripMargin,

    "q247_vocab_oov" ->
      """WITH tk AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, count(*) AS k FROM tk GROUP BY 1, 2),
        |gl AS (SELECT tok, CAST(sum(k) AS BIGINT) AS gf FROM tc GROUP BY 1),
        |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |pr AS (
        |  SELECT source, CAST(sum(k) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN gf < 10 THEN k ELSE 0 END) AS BIGINT) AS n_oov,
        |    count(DISTINCT CASE WHEN gf >= 10 THEN tok END) AS n_vocab_src
        |  FROM tc JOIN gl USING (tok) GROUP BY 1)
        |SELECT source, n_docs, n_tokens, n_oov, n_vocab_src,
        |  n_oov * 1000000 // n_tokens AS oov_ppm
        |FROM pr JOIN nd USING (source) ORDER BY source""".stripMargin,

    "q248_source_pivot" ->
      """SELECT lang,
        |  CAST(coalesce(sum(CASE WHEN source = 'src1' THEN n_chars END), 0) AS BIGINT) AS src1,
        |  CAST(coalesce(sum(CASE WHEN source = 'src2' THEN n_chars END), 0) AS BIGINT) AS src2,
        |  CAST(coalesce(sum(CASE WHEN source = 'src3' THEN n_chars END), 0) AS BIGINT) AS src3,
        |  CAST(coalesce(sum(CASE WHEN source = 'src4' THEN n_chars END), 0) AS BIGINT) AS src4,
        |  CAST(coalesce(sum(CASE WHEN source NOT IN ('src1','src2','src3','src4')
        |                    THEN n_chars END), 0) AS BIGINT) AS other
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q249_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, event_type AS kind
        |  FROM events),
        |t AS (SELECT *, lag(ts_ns) OVER
        |    (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_ns - prev > 1800000000000
        |    THEN 1 ELSE 0 END AS fresh FROM t),
        |ss AS (SELECT *, sum(fresh) OVER
        |    (PARTITION BY user_id ORDER BY ts_ns, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
        |tri AS (
        |  SELECT kind || '>' || lead(kind, 1) OVER w || '>' || lead(kind, 2) OVER w AS path,
        |    sid, lead(sid, 2) OVER w AS s2
        |  FROM ss WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id))
        |SELECT path, count(*) AS cnt FROM tri WHERE s2 = sid GROUP BY 1
        |ORDER BY cnt DESC, path LIMIT 10""".stripMargin,

    "q252_containment_decon" ->
      """WITH w AS (SELECT doc_id, source,
        |    regexp_split_to_array(trim(text), '\s+') AS wt FROM documents),
        |gr AS (SELECT DISTINCT doc_id, source, unnest(CASE WHEN len(wt) >= 3
        |    THEN list_transform(range(0, len(wt)-2),
        |      cdi -> array_to_string(wt[(CAST(cdi AS INT)+1):(CAST(cdi AS INT)+3)], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS ngram FROM w),
        |items AS (SELECT doc_id AS item_id, ngram FROM gr WHERE source = 'src0'),
        |itn AS (SELECT item_id, CAST(count(*) AS BIGINT) AS n_item
        |  FROM items GROUP BY 1),
        |sh AS (SELECT doc_id, item_id, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM (SELECT doc_id, ngram FROM gr WHERE source <> 'src0') c
        |  JOIN items USING (ngram) GROUP BY 1, 2)
        |SELECT doc_id, item_id, n_shared, n_item,
        |  n_shared * 1000000 // n_item AS contain_ppm
        |FROM sh JOIN itn USING (item_id)
        |WHERE n_shared >= 3 ORDER BY doc_id, item_id""".stripMargin,

    "q253_hybrid_rrf" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS wt FROM documents),
        |lexb AS (SELECT doc_id, CAST(len(wt) AS BIGINT) AS dl,
        |    CAST(list_contains(wt, 'table') AS BIGINT)
        |    + CAST(list_contains(wt, 'join') AS BIGINT)
        |    + CAST(list_contains(wt, 'window') AS BIGINT)
        |    + CAST(list_contains(wt, 'stream') AS BIGINT) AS n_hit FROM w),
        |lex AS (SELECT doc_id, CAST(row_number() OVER
        |    (ORDER BY n_hit DESC, dl, doc_id) AS BIGINT) AS rank_lex
        |  FROM lexb WHERE n_hit >= 1
        |  QUALIFY rank_lex <= 20),
        |n AS (SELECT vec_id,
        |    list_transform(embedding, rfx -> CAST(rfx AS DOUBLE)) AS vd
        |  FROM embeddings),
        |m AS (SELECT vec_id, vd,
        |    list_reduce(list_transform(vd, rfa -> abs(rfa)),
        |      (rfu, rfw) -> greatest(rfu, rfw)) AS mx FROM n),
        |q8 AS (SELECT vec_id,
        |    list_transform(vd, rfy -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(round(rfy*127.0/mx) AS BIGINT) END) AS qarr FROM m),
        |qv AS (SELECT qarr AS query_v FROM q8 WHERE vec_id = 0),
        |sem AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY
        |    list_reduce(list_transform(range(1, len(query_v)+1),
        |      rfi -> query_v[rfi] * qarr[rfi]), (rfs, rft) -> rfs + rft) DESC,
        |    vec_id) AS BIGINT) AS rank_sem
        |  FROM q8, qv WHERE vec_id <> 0
        |  QUALIFY rank_sem <= 20)
        |SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |  coalesce(lex.rank_lex, -1) AS rank_lex,
        |  coalesce(sem.rank_sem, -1) AS rank_sem,
        |  coalesce(1000000000000 // (60 + lex.rank_lex), 0)
        |  + coalesce(1000000000000 // (60 + sem.rank_sem), 0) AS rrf_scaled
        |FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
        |ORDER BY rrf_scaled DESC, doc_id""".stripMargin,

    "q254_negative_sampling" -> {
      val uh = Q.uhashSql("(CAST(r.nsj AS BIGINT))", "(c.c_custkey % 4294967291)")
      s"""WITH pos AS (SELECT DISTINCT o.o_custkey AS custkey,
         |    l.l_partkey AS partkey
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
         |np AS (SELECT max(p_partkey) + 1 AS np FROM part),
         |cand AS (SELECT custkey, min(nsj) AS j, partkey FROM (
         |    SELECT c.c_custkey AS custkey, CAST(r.nsj AS BIGINT) AS nsj,
         |      ($uh) % np.np AS partkey
         |    FROM customer c, range(30) r(nsj), np
         |    WHERE c.c_custkey % 20 = 0)
         |  GROUP BY custkey, partkey),
         |surv AS (SELECT cand.custkey, cand.j, cand.partkey,
         |    CAST(row_number() OVER (PARTITION BY cand.custkey
         |      ORDER BY cand.j) AS BIGINT) AS neg_rank
         |  FROM cand ANTI JOIN pos
         |    ON pos.custkey = cand.custkey AND pos.partkey = cand.partkey)
         |SELECT custkey, neg_rank, partkey FROM surv
         |WHERE neg_rank <= 10 ORDER BY custkey, neg_rank""".stripMargin
    },

    "q260_span_corruption" -> {
      val uh = Q.uhashSql("26000", "((doc_id * 1024 + i) % 4294967291)")
      s"""WITH w AS (SELECT doc_id,
         |    len(regexp_split_to_array(trim(text), '\\s+')) AS n FROM documents),
         |t AS (SELECT doc_id, CAST(unnest(range(0, n)) AS BIGINT) AS i FROM w),
         |h AS (SELECT doc_id, i,
         |    CASE WHEN ($uh) % 10 = 0 THEN 1 ELSE 0 END AS st FROM t),
         |m AS (SELECT *, max(st) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mk FROM h),
         |r AS (SELECT *, CASE WHEN mk = 1 AND coalesce(lag(mk) OVER
         |      (PARTITION BY doc_id ORDER BY i), 0) = 0
         |    THEN 1 ELSE 0 END AS run_start FROM m)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(mk) AS BIGINT) AS n_masked,
         |  CAST(sum(run_start) AS BIGINT) AS n_runs,
         |  CAST(sum(mk) * 1000000 // count(*) AS BIGINT) AS mask_ppm
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // The partitioned layout + dim join are physical; the relational
    // answer is the filtered aggregate.
    "q259_dynamic_pruning" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q258_stream_foreachbatch" ->
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

    "q255_random_projection" -> {
      val lists = Q.jlSigns.map(row => "list_value(" + row.mkString(",") + ")")
        .mkString("[", ", ", "]")
      s"""WITH n AS (SELECT vec_id,
         |    list_transform(embedding, jlx -> CAST(jlx AS DOUBLE)) AS vd
         |  FROM embeddings),
         |m AS (SELECT vec_id, vd,
         |    list_reduce(list_transform(vd, jla -> abs(jla)),
         |      (jlu, jlw) -> greatest(jlu, jlw)) AS mx FROM n),
         |q8 AS (SELECT vec_id,
         |    list_transform(vd, jly -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(round(jly*127.0/mx) AS BIGINT) END) AS qarr FROM m),
         |sg AS (SELECT unnest(range(0, 16)) AS d, unnest($lists) AS sv),
         |pr AS (SELECT vec_id, d,
         |    list_reduce(list_transform(range(1, 65),
         |      jli -> qarr[jli] * sv[jli]), (jls, jlt) -> jls + jlt) AS p
         |  FROM q8, sg),
         |qq AS (SELECT qarr AS qv FROM q8 WHERE vec_id = 0),
         |d16 AS (SELECT c.vec_id AS cid, sum(qp.p * c.p) AS dot16
         |  FROM pr c JOIN (SELECT d, p FROM pr WHERE vec_id = 0) qp USING (d)
         |  WHERE c.vec_id <> 0 GROUP BY 1),
         |d64 AS (SELECT c.vec_id AS cid,
         |    list_reduce(list_transform(range(1, 65),
         |      jlj -> qq.qv[jlj] * c.qarr[jlj]), (jlm, jln) -> jlm + jln) AS dot64
         |  FROM q8 c, qq WHERE c.vec_id <> 0),
         |sc AS (SELECT cid, dot64, dot16 FROM d64 JOIN d16 USING (cid)),
         |ex AS (SELECT cid, dot64, dot16, CAST(row_number() OVER
         |    (ORDER BY dot64 DESC, cid) AS BIGINT) AS rank
         |  FROM sc QUALIFY rank <= 10),
         |pj AS (SELECT cid, CAST(1 AS BIGINT) AS in_proj FROM sc
         |  QUALIFY row_number() OVER (ORDER BY dot16 DESC, cid) <= 10)
         |SELECT ex.rank, ex.cid, ex.dot64, CAST(ex.dot16 AS BIGINT) AS dot16,
         |  coalesce(pj.in_proj, 0) AS in_proj_top10
         |FROM ex LEFT JOIN pj USING (cid) ORDER BY rank""".stripMargin
    },

    "q256_ams_f2" -> {
      val uh = Q.uhashSql("(l.r + 25600)", "(e.user_id % 4294967291)")
      s"""WITH l AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS r),
         |s AS (SELECT l.r,
         |    CAST(1 AS BIGINT) - 2 * (($uh) % 2) AS sgn
         |  FROM events e, l),
         |sr AS (SELECT r, CAST(sum(sgn) AS BIGINT) AS sum_r FROM s GROUP BY 1),
         |ex AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2_exact
         |  FROM (SELECT count(*) AS c FROM events GROUP BY user_id))
         |SELECT r, sum_r,
         |  CAST(CAST(sum_r AS HUGEINT) * sum_r AS VARCHAR) AS x_r,
         |  CAST(f2_exact AS VARCHAR) AS f2_exact,
         |  CAST(CAST(sum_r AS HUGEINT) * sum_r - f2_exact AS VARCHAR) AS err
         |FROM sr, ex ORDER BY r""".stripMargin
    },

    "q257_attribution_sweep" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
        |    event_type AS kind
        |  FROM events WHERE event_type IN ('view', 'click')),
        |m AS (SELECT *,
        |    min(CASE WHEN kind = 'click'
        |        THEN CAST(ts_ns AS HUGEINT) * 4294967296 + event_id END)
        |      OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nck
        |  FROM e),
        |v AS (SELECT ts_ns, CAST(nck // 4294967296 AS BIGINT) AS c_ts
        |  FROM m WHERE kind = 'view'),
        |l AS (SELECT CAST(unnest([3600, 21600, 86400]) AS BIGINT) AS w_s)
        |SELECT w_s, CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(count(CASE WHEN c_ts IS NOT NULL
        |    AND c_ts <= ts_ns + w_s * 1000000000 THEN 1 END) AS BIGINT) AS n_conv,
        |  count(CASE WHEN c_ts IS NOT NULL
        |    AND c_ts <= ts_ns + w_s * 1000000000 THEN 1 END)
        |    * 1000000 // count(*) AS cvr_ppm
        |FROM v, l GROUP BY w_s ORDER BY w_s""".stripMargin,

    "q250_stream_full_outer" ->
      """WITH c AS (SELECT event_id AS cid, user_id AS cu, epoch_ns(ts) AS cns
        |    FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS vid, user_id AS vu, epoch_ns(ts) AS vns,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'view'),
        |j AS (SELECT coalesce(c.cu, v.vu) AS u, c.cid, v.vid, v.vc
        |  FROM c FULL JOIN v ON v.vu = c.cu AND v.vns <= c.cns
        |    AND v.vns >= c.cns - 3600000000000)
        |SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN cid IS NOT NULL AND vid IS NOT NULL THEN 1 END)
        |    AS BIGINT) AS n_matched,
        |  CAST(count(CASE WHEN vid IS NULL THEN 1 END) AS BIGINT) AS n_click_only,
        |  CAST(count(CASE WHEN cid IS NULL THEN 1 END) AS BIGINT) AS n_view_only,
        |  CAST(coalesce(sum(CASE WHEN vid IS NOT NULL THEN vc END), 0)
        |    AS BIGINT) AS view_value_c
        |FROM j GROUP BY u ORDER BY u""".stripMargin,

    "q251_stream_chain" ->
      """WITH c AS (SELECT user_id AS cu, epoch_ns(ts) AS cns,
        |    date_trunc('hour', ts) AS chour
        |  FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id AS vu, epoch_ns(ts) AS vns,
        |    CAST(round(value*100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'view')
        |SELECT strftime(chour, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(vc) AS BIGINT) AS view_value_c
        |FROM c JOIN v ON v.vu = c.cu AND v.vns <= c.cns
        |  AND v.vns >= c.cns - 3600000000000
        |GROUP BY chour ORDER BY hour_start""".stripMargin,

    // Mirrors q262: the same 30-min gap islands as q102's oracle but
    // WITHOUT dropping each user's last island — the timer emission is
    // exactly what closes those.
    "q262_tws_timers" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tns,
        |    CAST(round(value*100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT *, CASE WHEN lag(tns) OVER w IS NULL
        |      OR tns - lag(tns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns)),
        |i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tns
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM m)
        |SELECT user_id, min(tns) AS start_ns, max(tns) AS end_ns,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(vc) AS BIGINT) AS sum_c
        |FROM i GROUP BY user_id, isl
        |ORDER BY user_id, start_ns""".stripMargin,

    // the bloom prefilter is plan-only (no false negatives), so the
    // oracle is the exact dedup-then-decontaminate SQL: md5 groups →
    // min-id reps → gram join on representatives only
    "q261_decon_compose" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  WHERE source <> 'src2'),
        |g AS (SELECT md5(text) AS fp, min(doc_id) AS rid,
        |    CAST(count(*) AS BIGINT) AS n_copies
        |  FROM corpus GROUP BY 1),
        |reps AS (SELECT g.rid AS doc_id, g.n_copies, c.text
        |  FROM g JOIN corpus c ON c.doc_id = g.rid),
        |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS wt
        |  FROM reps),
        |gr AS (SELECT doc_id, unnest(CASE WHEN len(wt) >= 3
        |    THEN list_transform(range(0, len(wt)-2),
        |      dgi -> array_to_string(wt[(CAST(dgi AS INT)+1):(CAST(dgi AS INT)+3)], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS ngram
        |  FROM w),
        |bw AS (SELECT regexp_split_to_array(trim(text), '\s+') AS wt
        |  FROM documents WHERE source = 'src2'),
        |bv AS (SELECT DISTINCT unnest(CASE WHEN len(wt) >= 3
        |    THEN list_transform(range(0, len(wt)-2),
        |      dbi -> array_to_string(wt[(CAST(dbi AS INT)+1):(CAST(dbi AS INT)+3)], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END) AS ngram
        |  FROM bw),
        |sh AS (SELECT gr.doc_id, count(DISTINCT gr.ngram) AS n_shared
        |  FROM gr JOIN bv USING (ngram) GROUP BY 1)
        |SELECT r.doc_id AS rep_id, r.n_copies,
        |  CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST(CASE WHEN coalesce(sh.n_shared, 0) > 0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS contaminated
        |FROM reps r LEFT JOIN sh ON r.doc_id = sh.doc_id
        |ORDER BY rep_id""".stripMargin,
  )
}
