package graft.queries

import graft.operators.{Dedup, Sketches, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 pack: relational reshape (pivot / unpivot / grouping
  * sets), sketch-accelerated analytics with exact-answer guarantees
  * (Misra–Gries heavy hitters, GK-quantile rank audit), fuzzy
  * near-dup via banded edit distance, iterative graph rank (integer
  * fixed-point PageRank), Gopher-style quality rules, and a seeded
  * Poisson bootstrap resample — the remaining classic shapes of a
  * training-data pipeline's composition layer.
  *
  * Scale contracts (the reason each plan is shaped the way it is):
  *  - q152 pivots with an EXPLICIT value list, so no distinct-collect
  *    pre-job runs; the pivot is one hash aggregate.
  *  - q154 blocks the quadratic pair space by (lang, 256-wide length
  *    bin) with a 3-bin left expansion — every |Δlen| ≤ 256 pair is
  *    generated EXACTLY once by an equi-keyed hash join (never a
  *    nested loop), and the O(len²) edit distance runs on a bounded
  *    48-byte normalized prefix.
  *  - q155 sketches per partition (bounded memory, no shuffle), then
  *    recounts only the tiny candidate set; the Misra–Gries superset
  *    guarantee (see operators/Sketches.scala) makes the result equal
  *    to the exact answer, so the full-corpus groupBy of a naive plan
  *    shrinks to a broadcast-semi-join + small agg.
  *  - q158 is the Pregel shape: contributions shuffle on dst once per
  *    iteration; the degree-annotated edge list is one subtree reused
  *    by all three iterations (ReusedExchange).
  *  - Every cross-row sum is over longs (exact, associative) per Q's
  *    float policy, so results are partition-count independent.
  */
object ShapeQueries extends QueryPack {

  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** Normalized ASCII shadow prefix for edit distance: lower-case,
    * strip non-printable-ASCII, first 48 chars. On the ASCII shadow,
    * Spark's code-point Levenshtein and DuckDB's byte Levenshtein
    * agree (1 char = 1 byte); it's also the standard dedup
    * normalization (casefold + charset flattening). */
  private def asciiPrefix(text: Column): Column =
    substring(regexp_replace(lower(text), "[^ -~]", ""), 1, 48)

  /** Poisson(1) replicate count from a uniform draw: the inverse-CDF
    * ladder over uhash(doc_id) ∈ [0, P). Thresholds are
    * floor(cdf_k · P) for P = 4294967291, pinned as integer constants
    * so both engines run the identical comparison (no per-row float
    * math at all). Tail capped at 6 (cdf ≥ 0.99999). */
  private val PoissonThresholds =
    Seq(1580030166L, 3160060333L, 3950075417L, 4213413778L, 4279248368L, 4292415286L)

  private val BootstrapFamily = 15900

  private def uhash(i: Int, x: Column): Column = {
    val (ha, hb) = Dedup.affine(i)
    pmod(lit(ha) * pmod(x, lit(4294967291L)) + lit(hb), lit(4294967291L))
  }

  override def queries: Map[String, Q.Fn] = Map(

    // PIVOT reshape: the per-source language-mass matrix (corpus
    // composition dashboards want the wide shape). The value list is
    // explicit, so Spark skips the collect-distinct pre-job a bare
    // pivot() runs — at 100 TB that pre-job is a full extra scan; the
    // language axis of a corpus is a known small enum. One hash
    // aggregate, output cardinality = |sources|.
    "q152_pivot_matrix" -> { (s, dir) =>
      val wide = Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang", langs)
        .agg(sum(col("n_chars")))
      wide.select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).cast("long").as(l)): _*)
        .orderBy(col("source"))
    },

    // UNPIVOT (melt): per-doc metrics to (doc_id, metric, value) long
    // form — the shape metric stores and per-metric quantile jobs
    // want. Dataset.unpivot is a per-row Expand (no shuffle, no join);
    // output rows = docs × metrics.
    "q153_unpivot_metrics" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          col("n_chars").cast("long").as("chars"),
          size(TextOps.words(col("text"))).cast("long").as("tokens"))
        .unpivot(Array(col("doc_id")), Array(col("chars"), col("tokens")),
          "metric", "value")
        .orderBy(col("doc_id"), col("metric"))
    },

    // FUZZY near-dup via banded Levenshtein: candidate pairs blocked
    // on (lang, n_chars DIV 256); the left side expands to bins
    // {b−1, b, b+1}, the right stays at its own bin, and the
    // doc_a < doc_b gate keeps exactly one copy of each unordered
    // pair (a qualifying pair's bins differ by ≤ 1, and at most one
    // of the left doc's three emitted bins equals the right doc's
    // bin — so no distinct pass is needed). The |Δlen| ≤ 256 filter
    // then makes the binning invisible: the result set is identical
    // to the naive per-lang quadratic join the oracle runs, but the
    // plan is an equi-keyed hash join whose fan-in per bucket is the
    // local length-neighborhood, not the whole language. Distance on
    // the 48-char ASCII shadow (asciiPrefix) bounds the O(len²) DP
    // and keeps the two engines' Levenshteins identical.
    "q154_fuzzy_dedup" -> { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          asciiPrefix(col("text")).as("pfx"))
        .filter(length(col("pfx")) >= 24)
        .withColumn("bin", expr("n_chars DIV 256"))
      val left = d.select(col("doc_id").as("doc_a"), col("lang"),
          col("n_chars").as("na"), col("pfx").as("pa"),
          explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("jb"))
      val right = d.select(col("doc_id").as("doc_b"), col("lang"),
        col("n_chars").as("nb"), col("pfx").as("pb"), col("bin").as("jb"))
      left.join(right, Seq("lang", "jb"))
        .filter(col("doc_a") < col("doc_b") &&
          abs(col("na") - col("nb")) <= 256)
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
        .filter(col("dist") <= 12)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // HEAVY HITTERS, sketch-accelerated but EXACT: tokens with count
    // strictly above n/200. Pass 1 runs Misra–Gries(256) inside each
    // partition (bounded memory, zero shuffle) — the superset
    // guarantee means no true heavy hitter can be missed (see
    // Sketches.scala for the pigeonhole argument; 256 ≥ 200 is what
    // makes it hold). Pass 2 recounts ONLY the ≤ 256·P candidates via
    // a broadcast semi join and applies the exact threshold. The
    // candidate set itself depends on partitioning (fine — it's an
    // internal superset); the OUTPUT doesn't, which is what the
    // oracle checks. At 100 TB the naive plan shuffles every token;
    // this one shuffles candidates only.
    "q155_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val toks = Tables.table(s, dir, "documents")
        .select(explode(TextOps.words(col("text"))).as("w"))
      val cand = toks.as[String]
        .mapPartitions(it => Sketches.misraGries(it, 256))
        .toDF("w").distinct()
      val total = toks.agg(count(lit(1)).as("n"))
      toks.join(broadcast(cand), Seq("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * 200 > col("n"))
        .select(col("w"), col("cnt"))
        .orderBy(col("w"))
    },

    // QUANTILE-SKETCH rank audit (q118/q131 style: the approximate
    // operator runs for real, the OUTPUT is its verified guarantee):
    // per-language percentile_approx(n_chars, 0.5, accuracy=100) must
    // return an element whose rank interval [lt+1, le] intersects the
    // documented approxQuantile bound
    // [floor((p−err)·n), ceil((p+err)·n)], err = 1/accuracy. `ok` is
    // computed from actual counts against the actual sketch output
    // (integer floor/ceil via DIV, no floats); the sketch value itself
    // stays out of the output because GK merge order varies with
    // partitioning — the GUARANTEE is deterministic, the value isn't.
    "q156_quantile_audit" -> { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
      val ap = docs.groupBy(col("lang"))
        .agg(expr("percentile_approx(n_chars, 0.5D, 100)").as("approx"))
      docs.join(broadcast(ap), Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars") < col("approx"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("n_chars") <= col("approx"), 1L).otherwise(0L)).as("le"))
        .select(col("lang"), col("n"),
          when(col("le") >= expr("(49 * n) DIV 100") &&
            col("lt") + 1 <= expr("(51 * n + 99) DIV 100"), 1L)
            .otherwise(0L).as("ok"))
        .orderBy(col("lang"))
    },

    // GOPHER-style quality rules (Rae et al. 2021 §A1.1, adapted):
    // word count ∈ [50, 100000]; mean word length ∈ [3, 10]; '#'
    // symbol ratio ≤ 1/10 words; ≥ 80% words contain a Latin letter;
    // ≥ 2 English stopwords. All thresholds integer cross-multiplied
    // (3·words ≤ chars etc.) so no division ever runs. Pure per-row
    // map over array-local token stats — embarrassingly parallel,
    // whole-stage codegen, no shuffle but the output sort.
    "q157_gopher_rules" -> { (s, dir) =>
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val m = Tables.table(s, dir, "documents")
        .select(col("doc_id"), TextOps.words(col("text")).as("wt"),
          (length(col("text")) - length(expr("replace(text, '#', '')")))
            .cast("long").as("n_hash"))
        .select(col("doc_id"), col("n_hash"),
          size(col("wt")).cast("long").as("n_words"),
          length(array_join(col("wt"), "")).cast("long").as("word_chars"),
          size(filter(col("wt"), x => x.rlike("[A-Za-z]")))
            .cast("long").as("n_alpha"),
          size(filter(col("wt"), x => x.isin(stops: _*)))
            .cast("long").as("n_stop"))
      val fWc = col("n_words") >= 50 && col("n_words") <= 100000
      val fMwl = lit(3) * col("n_words") <= col("word_chars") &&
        col("word_chars") <= lit(10) * col("n_words")
      val fSym = lit(10) * col("n_hash") <= col("n_words")
      val fAlpha = lit(5) * col("n_alpha") >= lit(4) * col("n_words")
      val fStop = col("n_stop") >= 2
      def flag(c: Column): Column = when(c, 1L).otherwise(0L)
      m.select(col("doc_id"),
          flag(fWc).as("f_wc"), flag(fMwl).as("f_mwl"), flag(fSym).as("f_sym"),
          flag(fAlpha).as("f_alpha"), flag(fStop).as("f_stop"),
          flag(fWc && fMwl && fSym && fAlpha && fStop).as("keep"))
        .orderBy(col("doc_id"))
    },

    // PAGERANK, integer fixed-point, 3 unrolled iterations over the
    // customer↔supplier co-purchase bipartite graph (nodes 2·custkey
    // / 2·suppkey+1; each distinct trading pair is an undirected edge
    // = two directed edges, so every node has degree ≥ 1 and no
    // dangling mass exists). Ranks live in millionths: r₀ = 10⁶,
    // contribution = r DIV deg, r' = 0.15·10⁶ + (85·Σcontrib) DIV 100
    // — all long arithmetic, so the sums are associative and the
    // result is partition-independent (double-precision PageRank
    // would hash-drift under re-ordered adds). The Pregel shape: the
    // loop-invariant tables (edges, degrees, the degree-annotated
    // edge list) are persist()ed — WITHOUT that, each unrolled
    // iteration inlines the full upstream subtree and the plan grows
    // exponentially (observed: 66 parquet scans for 3 iterations;
    // with the caches: one scan pair + linear rank lineage). Each
    // iteration then moves ONLY the rank table: one shuffle-on-src
    // join + one shuffle-on-dst aggregate — exactly how an iterative
    // graph algorithm must be shaped at 100 TB (cache the edge list,
    // spill-capable MEMORY_AND_DISK, stream the ranks).
    "q158_pagerank" -> { (s, dir) =>
      val e0 = Tables.table(s, dir, "orders")
        .join(Tables.table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
        .persist()
      val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d")).persist()
      val ed = e.join(deg, Seq("src"))
        .select(col("src"), col("dst"), col("d")).persist()
      val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      def step(r: DataFrame): DataFrame =
        ed.join(r.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("r DIV d")).as("cs"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(85 * cs) DIV 100")).as("r"))
      step(step(step(r0)))
        .orderBy(col("r").desc, col("node"))
        .limit(50)
    },

    // POISSON(1) BOOTSTRAP resample: the standard distributed
    // bootstrap (Chamandy et al. / Kleiner's BLB lineage) — per-doc
    // replicate count k ~ Poisson(1) via the seeded inverse-CDF
    // ladder, rows exploded k times (the materialized resample), then
    // per-language replicate statistics next to the original counts.
    // Deterministic: the uniform draw is uhash(doc_id), the ladder
    // thresholds are pinned integers. Map-side explode (≤ 6×, mean
    // 1×), one agg per side — no extra shuffle beyond the aggs.
    "q159_poisson_bootstrap" -> { (s, dir) =>
      val u = uhash(BootstrapFamily, col("doc_id"))
      val reps = PoissonThresholds.zipWithIndex
        .foldRight(lit(6L): Column) { case ((t, k), els) =>
          when(u < t, k.toLong).otherwise(els)
        }
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), reps.as("reps"))
      val base = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val boot = d
        .select(col("lang"), col("n_chars"),
          explode(when(col("reps") > 0, sequence(lit(1L), col("reps")))
            .otherwise(array().cast("array<bigint>"))).as("i"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("boot_docs"),
          sum(col("n_chars")).cast("long").as("boot_chars"))
      base.join(boot, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"),
          coalesce(col("boot_docs"), lit(0L)).as("boot_docs"),
          coalesce(col("boot_chars"), lit(0L)).as("boot_chars"))
        .orderBy(col("lang"))
    },

    // EXPLICIT GROUPING SETS with grouping() flags — the q93/q109
    // rollup/cube family member where the set list is hand-picked:
    // per-lang totals, per-source totals, and the grand total, WITHOUT
    // the (lang, source) pair level a cube would force. One Expand →
    // one hash agg; output carries grouping() indicators so consumers
    // can tell a real 'de' row from an aggregate row.
    "q160_grouping_sets" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq.empty),
          col("lang"), col("source"))
        .agg(grouping(col("lang")).cast("long").as("g_lang"),
          grouping(col("source")).cast("long").as("g_source"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("chars"))
        .select(coalesce(col("lang"), lit("(all)")).as("lang"),
          coalesce(col("source"), lit("(all)")).as("source"),
          col("g_lang"), col("g_source"), col("n_docs"), col("chars"))
        .orderBy(col("g_lang"), col("g_source"), col("lang"), col("source"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q152_pivot_matrix" ->
      s"""SELECT source,
         |${langs.map(l => s"  CAST(coalesce(sum(CASE WHEN lang='$l' THEN n_chars END), 0) AS BIGINT) AS $l")
              .mkString(",\n")}
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q153_unpivot_metrics" ->
      """WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens
        |  FROM documents)
        |SELECT doc_id, 'chars' AS metric, chars AS value FROM m
        |UNION ALL SELECT doc_id, 'tokens' AS metric, tokens AS value FROM m
        |ORDER BY doc_id, metric""".stripMargin,

    // The oracle is the NAIVE quadratic-per-language join — the
    // blocking in the Spark plan must be invisible in the result set.
    "q154_fuzzy_dedup" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    substr(regexp_replace(lower(text), '[^ -~]', '', 'g'), 1, 48) AS pfx
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE abs(a.n_chars - b.n_chars) <= 256
        |  AND length(a.pfx) >= 24 AND length(b.pfx) >= 24
        |  AND levenshtein(a.pfx, b.pfx) <= 12
        |ORDER BY doc_a, doc_b""".stripMargin,

    // The oracle is the exact full-shuffle count — the sketch path
    // must land on the identical heavy-hitter set and counts.
    "q155_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok, tot GROUP BY w, tot.n HAVING count(*) * 200 > tot.n
        |ORDER BY w""".stripMargin,

    // ok = 1 IS the assertion: the GK sketch's rank guarantee held.
    // A sketch regression flips ok to 0 and fails the hash compare.
    "q156_quantile_audit" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(1 AS BIGINT) AS ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q157_gopher_rules" ->
      """WITH w AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS wt FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(wt) AS BIGINT) AS n_words,
        |    CAST(len(array_to_string(wt, '')) AS BIGINT) AS word_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
        |    CAST(len(list_filter(wt, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(wt, x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop
        |  FROM w)
        |SELECT doc_id,
        |  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS f_wc,
        |  CAST(CASE WHEN 3*n_words <= word_chars AND word_chars <= 10*n_words THEN 1 ELSE 0 END AS BIGINT) AS f_mwl,
        |  CAST(CASE WHEN 10*n_hash <= n_words THEN 1 ELSE 0 END AS BIGINT) AS f_sym,
        |  CAST(CASE WHEN 5*n_alpha >= 4*n_words THEN 1 ELSE 0 END AS BIGINT) AS f_alpha,
        |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS f_stop,
        |  CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND 3*n_words <= word_chars AND word_chars <= 10*n_words
        |    AND 10*n_hash <= n_words AND 5*n_alpha >= 4*n_words
        |    AND n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q158_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
        |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS cs FROM e
        |    JOIN deg ON e.src = deg.node JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r1 AS (SELECT node, CAST(150000 + (85 * cs) // 100 AS BIGINT) AS r FROM c1),
        |c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS cs FROM e
        |    JOIN deg ON e.src = deg.node JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r2 AS (SELECT node, CAST(150000 + (85 * cs) // 100 AS BIGINT) AS r FROM c2),
        |c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS cs FROM e
        |    JOIN deg ON e.src = deg.node JOIN r2 ON e.src = r2.node GROUP BY e.dst),
        |r3 AS (SELECT node, CAST(150000 + (85 * cs) // 100 AS BIGINT) AS r FROM c3)
        |SELECT node, r FROM r3 ORDER BY r DESC, node LIMIT 50""".stripMargin,

    "q159_poisson_bootstrap" -> {
      val uh = Q.uhashSql(BootstrapFamily.toString, "(doc_id % 4294967291)")
      val ladder = PoissonThresholds.zipWithIndex
        .map { case (t, k) => s"WHEN $uh < $t THEN $k" }.mkString("\n         |    ")
      s"""WITH k AS (SELECT doc_id, lang, n_chars,
         |    CASE $ladder
         |    ELSE 6 END AS reps
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(reps) AS BIGINT) AS boot_docs,
         |  CAST(sum(reps * n_chars) AS BIGINT) AS boot_chars
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q160_grouping_sets" ->
      """SELECT coalesce(lang, '(all)') AS lang,
        |  coalesce(source, '(all)') AS source,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY g_lang, g_source, lang, source""".stripMargin
  )
}
