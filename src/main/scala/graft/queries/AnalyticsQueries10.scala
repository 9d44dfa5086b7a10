package graft.queries

import graft.functions.MisraGries
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 pack: data-selection and corpus-layout operators for the
  * training-data pipeline — hashed-feature importance resampling
  * (q267, the DSIR shape of Xie et al. 2023), deterministic
  * Misra–Gries heavy hitters (q268, the mergeable-summaries member
  * of the frequency-sketch family next to the probabilistic CMS
  * q205), a total-variation corpus-drift matrix (q269, the all-pairs
  * domain-shift audit), and context-window sequence packing (q270 —
  * the concat-and-chunk step that turns a document corpus into
  * fixed-length pretraining examples).
  *
  * House float/determinism policy throughout (QueryPack.scala):
  * q267/q269 keep their statistics in exact integer rationals
  * (ppm/milli scaling, DECIMAL widening where products can wrap —
  * the q176 policy) instead of float log-ratios — the same
  * engine-ulp reasoning that picked Gini–Simpson over Shannon
  * entropy (AnalyticsQueries2); q268's output never depends on the
  * merge-order-dependent sketch internals (MisraGries.scala proves
  * why); q270's "random" shard assignment is the q264 hash-threshold
  * policy, zero RNG state.
  */
object AnalyticsQueries10 extends QueryPack {
  import Q.Fn

  /** Tokens of `documents.text` with doc identity — the shared
    * tokenization of q267/q268/q269 (whitespace words, no alphabetic
    * gate: hashing tolerates any byte, unlike q263's merge-expression
    * injection which needed the [a-z]+ precondition). */
  private def toks(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)

  private val toksSql: String =
    """SELECT doc_id, lang, word FROM (
      |    SELECT doc_id, lang,
      |           unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      |    FROM documents) WHERE length(word) > 0""".stripMargin

  val queries = Map[String, Fn](

    // DSIR-SHAPE IMPORTANCE RESAMPLING (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): fit
    // a hashed-unigram model of a TARGET domain (here lang='en', the
    // quality-domain stand-in) and of the RAW corpus, score every
    // document by its tokens' target/raw importance, then resample
    // with acceptance probability proportional to the score via the
    // q264 deterministic hash threshold (zero RNG state — the same
    // rows are kept at any parallelism on any cluster).
    //
    // Exactness deviation from the paper, by house policy: the
    // per-bucket statistic is an exact integer rational
    //   score_b = ((t_ppm+1)·1000) DIV (r_ppm+1)
    // (a milli-scaled smoothed likelihood RATIO) summed per doc,
    // instead of the float log-ratio sum — ln differs by 1 ulp
    // between engines (the Gini-vs-Shannon precedent), and the
    // ratio is monotone in the same per-bucket evidence. Since the
    // target is a subset of the raw corpus, r_b ≥ t_b bounds
    // score_b ≤ ~(R/T)·1000, so doc_score·1e6 stays far under 2⁶³.
    //
    // Scale shape: the bucket model is ONE corpus-sized hash agg onto
    // 128 fixed buckets (map-side partial combine does the heavy
    // lifting); both totals ride a single global window over the
    // ≤128-row model (q145 whitelisted shape); scoring is a broadcast
    // hash join of the corpus against the 128-row model + one
    // (doc_id)-keyed agg; the max-score normalizer is the q85/q86
    // 1-row broadcast scalar. Nothing shuffles the corpus twice.
    "q267_dsir_resample" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val t = toks(s, dir)
        .withColumn("b",
          expr("(" + Q.uhashSql("26700", "rolling_hash(word)") + ") % 128"))
      val wAll = Window.partitionBy() // ONE node: both totals in one select
      val model = t.groupBy(col("b"))
        .agg(count(lit(1)).as("r_b"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_b"))
        .select(col("b"), col("r_b"), col("t_b"),
          sum(col("r_b")).over(wAll).as("rt"),
          sum(col("t_b")).over(wAll).as("tt"))
        .select(col("b"), expr(
          "(((t_b + 1) * 1000000 DIV (tt + 128)) + 1) * 1000 DIV " +
            "(((r_b + 1) * 1000000 DIV (rt + 128)) + 1)").as("score"))
      val scored = t.join(broadcast(model), Seq("b"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("score")).as("doc_score"), count(lit(1)).as("n_toks"))
      val mx = scored.agg(max(col("doc_score")).as("max_score"))
      scored.crossJoin(broadcast(mx))
        .withColumn("h", expr("(" + Q.uhashSql("26701", "doc_id") + ") % 1000000"))
        .withColumn("keep", expr("h < (doc_score * 1000000) DIV max_score"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("IF(keep, 1L, 0L)")).as("n_sampled"),
          sum(expr("IF(keep, n_toks, 0L)")).as("sampled_tokens"))
        .orderBy(col("lang"))
    },

    // MISRA–GRIES HEAVY HITTERS (deterministic frequency sketch —
    // Misra & Gries 1982; mergeable-summaries merge per Agarwal et
    // al. 2012): pass 1 aggregates a k=16-counter MG summary as a
    // typed Aggregator (per-partition partials merged associatively —
    // the exact mergeable-summary model, see MisraGries.scala), whose
    // candidate set PROVABLY contains every item with true frequency
    // > N/(k+1) under any merge tree; pass 2 rescans with the ≤16-
    // candidate broadcast filter, counts exactly, and keeps the
    // guarantee threshold. The output is therefore the EXACT heavy
    // hitters — deterministic although the sketch internals are
    // merge-order-dependent — which is what makes a frequency sketch
    // oracle-checkable at all (the CMS q205 needed rank tie-breaks;
    // this needs nothing). The item stream is the corpus CHARACTER
    // stream (the driver corpus's word distribution is flat — no word
    // reaches 1/17 — while its letter frequencies are natural-language
    // skewed: 7 of 24 letters exceed the bound, and 24 > k forces the
    // decrement path the sketch exists for). Scale shape: pass 1
    // shuffles k-entry maps (one per partition), pass 2 is a scan +
    // 16-way hash-set filter + a 16-group agg; the driver holds ≤16
    // single-char strings.
    "q268_misra_gries" -> { (s, dir) =>
      import s.implicits._
      val chars = toks(s, dir).select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        .as("ch"))
      val candidates = chars.as[String].select(MisraGries(16).toColumn).head()
      val total = chars.count()
      chars.filter(col("ch").isin(candidates: _*))
        .groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(17L) > lit(total))
        .select(col("ch"), col("cnt"),
          expr(s"cnt * 1000000 DIV ${total}L").as("share_ppm"))
        .orderBy(col("cnt").desc, col("ch").asc)
    },

    // TOTAL-VARIATION CORPUS-DRIFT MATRIX (the all-pairs domain-shift
    // audit a mixture-weighted corpus runs before setting q98/q264
    // weights): TV(P_a, P_b) = ½ Σ_w |p_a(w) − p_b(w)| between every
    // language pair's unigram distributions, held EXACT as the
    // integer rational Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) and emitted
    // as ppm (TV over JS/KL by the no-ln house policy — and TV is the
    // distance with the direct data-mixing reading: the mass you must
    // move). Absent-word terms are closed-form — Σ_{a-only} c_a·N_b =
    // (N_a − S_a)·N_b with S_a the common-support sum — so an INNER
    // word join suffices; no full-outer, no missing-row handling.
    // Scale shape: one corpus-sized (lang, word) hash agg, then
    // dict-sized shuffles only (the word self-join is ≤|langs|² rows
    // per word); products widen to DECIMAL(38,0) before summing (the
    // q176 policy — c·N reaches 10²⁴ at 100 TB) and the ppm emits as
    // BIGINT.
    "q269_tv_drift" -> { (s, dir) =>
      val wc = toks(s, dir)
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
        .persist() // two references below: the pair join's both sides + totals
      val totals = wc.groupBy(col("lang")).agg(sum(col("c")).as("n"))
      val a = wc.select(col("lang").as("lang_a"), col("word"), col("c").as("c_a"))
      val b = wc.select(col("lang").as("lang_b"), col("word"), col("c").as("c_b"))
      val out = a.join(b, Seq("word")).filter(col("lang_a") < col("lang_b"))
        .join(broadcast(totals.select(col("lang").as("lang_a"), col("n").as("n_a"))), Seq("lang_a"))
        .join(broadcast(totals.select(col("lang").as("lang_b"), col("n").as("n_b"))), Seq("lang_b"))
        .groupBy(col("lang_a"), col("lang_b"))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          sum(abs(col("c_a").cast("decimal(38,0)") * col("n_b") -
            col("c_b").cast("decimal(38,0)") * col("n_a"))).as("d_common"),
          sum(col("c_a")).as("s_a"), sum(col("c_b")).as("s_b"))
        .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
          expr("CAST(((d_common + (n_a - s_a) * CAST(n_b AS DECIMAL(38,0)) + " +
            "(n_b - s_b) * CAST(n_a AS DECIMAL(38,0))) * 1000000) DIV " +
            "(2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("tv_ppm"))
        .orderBy(col("lang_a"), col("lang_b"))
      out.persist().count() // pin the ≤|langs|² result, then free the dict
      wc.unpersist()
      out
    },

    // CONTEXT-WINDOW SEQUENCE PACKING (the concat-and-chunk step that
    // turns a document stream into fixed C=256-token pretraining
    // examples): documents are dealt to 8 independent packer shards
    // by the q264 hash policy (a real pipeline packs per worker
    // stream — shard-local boundaries ARE the production semantics,
    // and the shard count is the parallelism knob), each shard
    // concatenates its docs in deterministic doc_id order and cuts
    // every 256 tokens; a doc whose [cum−n, cum) token span crosses a
    // 256 boundary is a SPLIT doc (crosses examples). Output per
    // lang: docs, tokens, chunks, split docs, and the padding-waste
    // ppm of the ragged last chunk per shard — the packing-efficiency
    // number that decides the shard/context-size trade.
    // Scale shape: one window per (lang, shard) — parallelism grows
    // with the shard knob, never a global order — then two tiny aggs.
    "q270_context_pack" -> { (s, dir) =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          when(length(trim(col("text"))) === 0, 0L)
            .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
            .as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .withColumn("shard", expr("(" + Q.uhashSql("27000", "doc_id") + ") % 8"))
      val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      d.withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("first_c", expr("(cum - n_tokens) DIV 256"))
        .withColumn("last_c", expr("(cum - 1) DIV 256"))
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"),
          sum(expr("IF(last_c > first_c, 1L, 0L)")).as("n_split"))
        .withColumn("n_chunks", expr("(toks + 255) DIV 256"))
        .groupBy(col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("toks")).as("total_tokens"),
          sum(col("n_chunks")).as("n_chunks"),
          sum(col("n_split")).as("n_split_docs"))
        .withColumn("waste_ppm", expr(
          "(n_chunks * 256 - total_tokens) * 1000000 DIV (n_chunks * 256)"))
        .orderBy(col("lang"))
    },
  )

  // ——— DuckDB restatements ———

  val oracle = Map(
    "q267_dsir_resample" -> {
      val ph = Q.polyHashSql("word")
      val uhb = Q.uhashSql("26700", ph)
      val uhd = Q.uhashSql("26701", "doc_id")
      s"""WITH t AS (
         |  SELECT doc_id, lang, ($uhb) % 128 AS b FROM ($toksSql)),
         |model AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS r_b,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_b
         |  FROM t GROUP BY b),
         |m2 AS (
         |  SELECT b, (((t_b + 1) * 1000000 // (tt + 128)) + 1) * 1000 //
         |            (((r_b + 1) * 1000000 // (rt + 128)) + 1) AS score
         |  FROM (SELECT *, CAST(sum(r_b) OVER () AS BIGINT) AS rt,
         |               CAST(sum(t_b) OVER () AS BIGINT) AS tt FROM model)),
         |scored AS (
         |  SELECT doc_id, lang, CAST(sum(score) AS BIGINT) AS doc_score,
         |         CAST(count(*) AS BIGINT) AS n_toks
         |  FROM t JOIN m2 USING (b) GROUP BY doc_id, lang),
         |mx AS (SELECT max(doc_score) AS max_score FROM scored),
         |k AS (
         |  SELECT lang, n_toks,
         |         (($uhd) % 1000000) < (doc_score * 1000000) // max_score AS keep
         |  FROM scored CROSS JOIN mx)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN keep THEN n_toks ELSE 0 END) AS BIGINT) AS sampled_tokens
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    },

    // The oracle needs no MG machinery: the Spark side's output is
    // provably the exact heavy hitters above N/(k+1) (the candidate
    // superset guarantee + exact rescore — MisraGries.scala), which
    // is one GROUP BY + HAVING.
    "q268_misra_gries" ->
      s"""WITH chs AS (
         |  SELECT unnest(list_transform(range(1, length(word) + 1),
         |    chi -> substr(word, CAST(chi AS INT), 1))) AS ch
         |  FROM ($toksSql)),
         |c AS (SELECT ch, CAST(count(*) AS BIGINT) AS cnt FROM chs GROUP BY ch),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
         |SELECT ch, cnt, cnt * 1000000 // n AS share_ppm
         |FROM c CROSS JOIN t WHERE cnt * 17 > n
         |ORDER BY cnt DESC, ch ASC""".stripMargin,

    "q269_tv_drift" ->
      s"""WITH wc AS (
         |  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
         |  FROM ($toksSql) GROUP BY lang, word),
         |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY lang),
         |p AS (
         |  SELECT a.lang AS lang_a, b.lang AS lang_b,
         |    max(ta.n) AS n_a, max(tb.n) AS n_b,
         |    sum(abs(CAST(a.c AS HUGEINT) * tb.n - CAST(b.c AS HUGEINT) * ta.n)) AS d_common,
         |    CAST(sum(a.c) AS BIGINT) AS s_a, CAST(sum(b.c) AS BIGINT) AS s_b
         |  FROM wc a JOIN wc b ON a.word = b.word AND a.lang < b.lang
         |  JOIN tot ta ON ta.lang = a.lang
         |  JOIN tot tb ON tb.lang = b.lang
         |  GROUP BY a.lang, b.lang)
         |SELECT lang_a, lang_b, n_a, n_b,
         |  CAST(((d_common + (n_a - s_a) * CAST(n_b AS HUGEINT) +
         |         (n_b - s_b) * CAST(n_a AS HUGEINT)) * 1000000) //
         |       (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS tv_ppm
         |FROM p ORDER BY lang_a, lang_b""".stripMargin,

    "q270_context_pack" -> {
      val uh = Q.uhashSql("27000", "doc_id")
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         |    END AS n_tokens,
         |    ($uh) % 8 AS shard
         |  FROM documents),
         |f AS (SELECT * FROM d WHERE n_tokens > 0),
         |cumm AS (
         |  SELECT lang, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang, shard
         |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM f),
         |sh AS (
         |  SELECT lang, shard, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS toks,
         |    CAST(sum(CASE WHEN (cum - 1) // 256 > (cum - n_tokens) // 256
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_split
         |  FROM cumm GROUP BY lang, shard)
         |SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS total_tokens,
         |  CAST(sum((toks + 255) // 256) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_split) AS BIGINT) AS n_split_docs,
         |  (CAST(sum((toks + 255) // 256) AS BIGINT) * 256 -
         |   CAST(sum(toks) AS BIGINT)) * 1000000 //
         |  (CAST(sum((toks + 255) // 256) AS BIGINT) * 256) AS waste_ppm
         |FROM sh GROUP BY lang ORDER BY lang""".stripMargin
    },
  )
}
