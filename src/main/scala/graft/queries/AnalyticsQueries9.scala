package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 pack: tokenizer TRAINING and sampling operators for the
  * training-data pipeline — distributed BPE merge learning (q263),
  * deterministic fractional-repeat domain rebalancing (q264), a
  * mergeable bottom-k hash-sample quantile sketch (q265, the
  * quantile member of the sketch family next to HLL q224 / KMV q228 /
  * CMS q205 / AMS q256), and BPE tokenization-with-merges (q266 —
  * the learned q263 table applied corpus-wide, closing the
  * tokenizer loop into the q247 vocab-audit shape).
  *
  * All three follow the house float/determinism policy
  * (QueryPack.scala): integer or picked-not-computed outputs, hash
  * thresholds instead of RNG state, and every inter-engine comparison
  * bit-exact by construction.
  */
object AnalyticsQueries9 extends QueryPack {
  import Q.Fn

  val queries = Map[String, Fn](

    // DISTRIBUTED BPE TOKENIZER TRAINING (the merge-learning loop of
    // Sennrich et al. 2016 — the operator q247's vocab/OOV audit
    // presupposes but nothing here learned until now): 6 iterations of
    //   (1) adjacent-pair counts over the word-frequency dict,
    //   (2) global argmax (count DESC, pair ASC — deterministic),
    //   (3) left-to-right non-overlapping merge rewrite of every word.
    // Scale shape: classic BPE trains on the DISTINCT-WORD dict, not
    // the corpus — the corpus is touched ONCE (one groupBy(word)
    // shuffle); each iteration then shuffles only fixed-width pair
    // keys of the dict (|vocab| rows, corpus-size-free), the argmax is
    // a TakeOrdered (no full sort, 1 row to the driver — the same
    // bounded per-iteration driver scalar as q158's convergence
    // check), and the rewrite is a map-only array fold. At 100 TB the
    // dict is billions of rows where the corpus is trillions of
    // tokens; every per-iteration cost is dict-sized. Output: the
    // learned merge table (step, pair, pair_count). The whole loop —
    // dict build (with the Tables.documentsWide scan-parallelism
    // guard and the [a-z]+ precondition), learn, merge fold — lives
    // in TextOps.bpeDict/bpeLearn, the SHARED operator q266's apply
    // side consumes: learn once, persist the table, apply everywhere.
    "q263_bpe_merges" -> { (s, dir) =>
      import s.implicits._
      val dict = graft.operators.TextOps.bpeDict(Tables.documentsWide(s, dir), "text")
      graft.operators.TextOps.bpeLearn(dict, 6)
        .toDF("step", "pair", "pair_count").orderBy(col("step"))
    },

    // FRACTIONAL-REPEAT DOMAIN REBALANCING (the upsampling step of
    // every mixture-weighted pretraining corpus — minority languages
    // repeated toward parity with the majority): each lang with c_l
    // docs is emitted ⌊T/c_l⌋ full epochs (T = the largest lang's
    // count) plus one partial epoch holding the docs whose
    // uhash(doc_id) mod c_l falls under T mod c_l — a deterministic
    // hash threshold, zero RNG state, so the "random" partial epoch
    // is reproducible row-for-row on any cluster at any parallelism.
    // Scale shape: the lang histogram is a 5-row broadcast CARRYING
    // its own max (t_max rides the histogram via a global window over
    // the ≤|langs| already-aggregated rows — the q145 whitelisted
    // shape — so no second scalar-attach join exists in the plan),
    // the epoch assignment is map-only arithmetic, and the explode
    // emits each repeat WITH its epoch number (downstream shuffles
    // can salt on it — repeats of one doc need not co-locate).
    // Nothing collects; nothing shuffles the corpus.
    "q264_lang_upsample" -> { (s, dir) =>
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
      val cnts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c_l"))
        .withColumn("t_max", max(col("c_l")).over(Window.partitionBy()))
      docs.join(broadcast(cnts), Seq("lang"))
        .withColumn("h", expr(Q.uhashSql("26400", "doc_id")))
        .withColumn("epochs", expr(
          "t_max DIV c_l + IF(h % c_l < t_max % c_l, 1L, 0L)"))
        .select(col("lang"), col("doc_id"),
          explode(expr("sequence(1L, epochs)")).as("epoch"))
        .orderBy(col("lang"), col("doc_id"), col("epoch"))
    },

    // BOTTOM-K QUANTILE SKETCH (the quantile member of the sketch
    // family): per event type, the 64 rows with the smallest
    // uhash(event_id) form a uniform mergeable sample — bottom-k by a
    // fixed hash is closed under union (bottom-k of a union = bottom-k
    // of the concatenated bottom-k's), the same order-statistics trick
    // as q228's KMV, so per-partition partial sketches combine
    // associatively on a real cluster. Quantile estimates are then
    // PICKED (never interpolated) at ceil(p·n) of the sample's
    // (value, event_id) order — copied doubles, bit-exact across
    // engines by construction. Scale shape: the rank-filter window is
    // Spark's WindowGroupLimit rewrite (map-side partial top-k per
    // type, no full sort, ≤ 64·types rows ever shuffle); everything
    // downstream runs on sketch rows. BottomKQuantileSpec pins the
    // merge-closure property.
    "q265_bottomk_quantiles" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("h", expr(Q.uhashSql("26500", "event_id")))
      val wk = Window.partitionBy(col("event_type"))
        .orderBy(col("h"), col("event_id"))
      val sample = ev.withColumn("rk", row_number().over(wk))
        .filter(col("rk") <= 64)
        .select(col("event_type"), col("event_id"), col("value"))
      val n = sample.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sample"))
      val wv = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      sample.join(broadcast(n), Seq("event_type"))
        .withColumn("vr", row_number().over(wv))
        .groupBy(col("event_type"))
        .agg(max(col("n_sample")).as("n_sample"),
          max(expr("CASE WHEN vr = (25*n_sample+99) DIV 100 THEN value END")).as("q25"),
          max(expr("CASE WHEN vr = (50*n_sample+99) DIV 100 THEN value END")).as("q50"),
          max(expr("CASE WHEN vr = (75*n_sample+99) DIV 100 THEN value END")).as("q75"),
          max(expr("CASE WHEN vr = (90*n_sample+99) DIV 100 THEN value END")).as("q90"))
        .orderBy(col("event_type"))
    },

    // BPE TOKENIZATION WITH LEARNED MERGES (the apply side of q263,
    // closing the tokenizer-training loop: learn merges → tokenize
    // the corpus with them → audit the resulting subword vocabulary,
    // the q247 audit re-run on SUBWORD units). Learn and apply are
    // the SHARED TextOps operators: bpeLearn returns the merge TABLE
    // (here re-learned on the same dict — identical to q263's by the
    // deterministic argmax; in production the table is persisted
    // between learn and apply, the q44 checkpoint contract), and
    // bpeApply composes the 6 merges into ONE map-only fold over the
    // pinned dict — no per-generation persists on the apply side.
    // The audited token stream: corpus frequency per subword,
    // distinct words containing it, and the char-coverage share.
    // After 6 merges every token is a single [a-z] char or one of
    // the ≤6 merge results, so the output vocabulary is ≤32 rows by
    // construction. Scale shape: the learning loop is q263's (corpus
    // touched ONCE for the pinned dict, per-iteration cost
    // dict-sized, 1-row argmax collects); the audit is ONE dict-sized
    // shuffle keyed by token; the char-coverage total rides a global
    // window over the ≤32 already-aggregated token rows (the q145
    // whitelisted shape). tok_len·corpus_freq·1e6 stays under 2⁶³
    // until the corpus passes ~9e12 chars per token — at that scale
    // widen to DECIMAL internally and keep the BIGINT ppm output
    // (the q176 policy).
    "q266_bpe_tokenize" -> { (s, dir) =>
      import graft.operators.TextOps
      val dict = TextOps.bpeDict(Tables.documentsWide(s, dir), "text").persist()
      dict.count() // the one corpus scan: learn's gen 0 AND the apply read this
      val merges = TextOps.bpeLearn(dict, 6)
      val audit = TextOps.bpeApply(dict, merges.map(_._2))
        .select(col("word"), col("cnt"), explode(col("syms")).as("tok"))
        .groupBy(col("tok"))
        .agg(sum(col("cnt")).as("corpus_freq"),
          count_distinct(col("word")).as("n_words"))
        .withColumn("tok_len", length(col("tok")).cast("long"))
        .withColumn("total_chars",
          sum(expr("tok_len * corpus_freq")).over(Window.partitionBy()))
        .select(col("tok"), col("tok_len"), col("corpus_freq"),
          col("n_words"),
          expr("tok_len * corpus_freq * 1000000 DIV total_chars")
            .as("char_ppm"))
        .orderBy(col("corpus_freq").desc, col("tok").asc)
        .persist()
      audit.count() // pin the ≤32-row result, then free the dict
      dict.unpersist()
      audit
    },
  )

  // ——— DuckDB restatements ———

  /** One BPE oracle stage: pair counts over stage k−1's states, the
    * argmax (count DESC, pair ASC — '+' sorts below [a-z] in both
    * engines' binary collation, so pair-string order ≡ (x, y) tuple
    * order), and the merged states. States are chr(1)-joined symbol
    * strings; the merge is a list_reduce whose seed is the first
    * symbol (≡ Spark's fold from an empty array) and whose guard
    * matches the accumulator's LAST symbol only (`acc = x` or
    * `acc LIKE '%'‖chr(1)‖x` — symbols are [a-z]+, so no LIKE
    * metacharacter can appear). Prototyped against a pure-Python BPE
    * at sf0.001: bit-identical merge tables. `carry` threads extra
    * s-columns through the rewrite stages (q266 carries `s.word, `
    * for its distinct-word audit; q263 carries nothing).
    *
    * The rewrite stage joins b$k with LEFT JOIN ON TRUE, not CROSS
    * JOIN: on a vintage where step k has no learnable pair (b$k
    * empty — all states single-symbol), a cross join would EMPTY
    * s$k and every later stage, so q266's final-state audit would
    * return zero rows while Spark's bpeLearn (best.nonEmpty guard)
    * stops early and audits the partially-merged states. The left
    * join keeps the row with NULL b.x/b.y; `be = b.y` is then NULL →
    * CASE ELSE → identity rewrite — exactly Spark's early stop. */
  private[queries] def bpeStage(k: Int, carry: String = ""): String =
    s"""p$k AS (
       |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(sy)),
       |      bpi -> sy[bpi] || '+' || sy[bpi+1])) AS pair
       |    FROM (SELECT cnt, string_split(state, chr(1)) AS sy FROM s${k - 1}))
       |  GROUP BY pair),
       |b$k AS (
       |  SELECT pair, pc, string_split(pair, '+')[1] AS x,
       |         string_split(pair, '+')[2] AS y
       |  FROM p$k ORDER BY pc DESC, pair ASC LIMIT 1),
       |s$k AS (
       |  SELECT ${carry}s.cnt, list_reduce(string_split(s.state, chr(1)), (bacc, be) ->
       |    CASE WHEN be = b.y AND (bacc = b.x OR bacc LIKE '%' || chr(1) || b.x)
       |         THEN substr(bacc, 1, length(bacc) - length(b.x)) || b.x || b.y
       |         ELSE bacc || chr(1) || be END) AS state
       |  FROM s${k - 1} s LEFT JOIN b$k b ON TRUE)""".stripMargin

  val oracle = Map(
    "q263_bpe_merges" ->
      ("""WITH w AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word),
        |s0 AS (
        |  SELECT cnt, list_reduce(
        |    list_transform(range(1, length(word)+1),
        |      bci -> substr(word, CAST(bci AS INT), 1)),
        |    (ba, bb) -> ba || chr(1) || bb) AS state FROM w),
        |""".stripMargin
        + (1 to 6).map(bpeStage(_)).mkString(",\n") + "\n"
        + "SELECT step, pair, pair_count FROM (\n"
        + (1 to 6).map(k =>
            s"  SELECT CAST($k AS BIGINT) AS step, pair, pc AS pair_count FROM b$k")
          .mkString(" UNION ALL\n")
        + ") ORDER BY step"),

    "q264_lang_upsample" -> {
      val uh = Q.uhashSql("26400", "doc_id")
      s"""WITH c AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS c_l
         |  FROM documents GROUP BY lang),
         |t AS (SELECT max(c_l) AS t_max FROM c),
         |d AS (
         |  SELECT doc_id, d.lang, c_l, t_max, $uh AS h
         |  FROM documents d JOIN c USING (lang) CROSS JOIN t)
         |SELECT lang, doc_id,
         |  unnest(range(1, (t_max // c_l) +
         |    (CASE WHEN h % c_l < t_max % c_l THEN 1 ELSE 0 END) + 1)) AS epoch
         |FROM d ORDER BY lang, doc_id, epoch""".stripMargin
    },

    "q265_bottomk_quantiles" -> {
      val uh = Q.uhashSql("26500", "event_id")
      s"""WITH e AS (
         |  SELECT event_type, event_id, value, $uh AS h FROM events),
         |s AS (
         |  SELECT event_type, event_id, value FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY event_type ORDER BY h, event_id) AS rk FROM e)
         |  WHERE rk <= 64),
         |n AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample
         |  FROM s GROUP BY event_type),
         |r AS (
         |  SELECT s.*, n_sample, row_number() OVER (
         |    PARTITION BY s.event_type ORDER BY value, event_id) AS vr
         |  FROM s JOIN n USING (event_type))
         |SELECT event_type, max(n_sample) AS n_sample,
         |  max(CASE WHEN vr = (25*n_sample+99)//100 THEN value END) AS q25,
         |  max(CASE WHEN vr = (50*n_sample+99)//100 THEN value END) AS q50,
         |  max(CASE WHEN vr = (75*n_sample+99)//100 THEN value END) AS q75,
         |  max(CASE WHEN vr = (90*n_sample+99)//100 THEN value END) AS q90
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "q266_bpe_tokenize" ->
      ("""WITH w AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word),
        |s0 AS (
        |  SELECT word, cnt, list_reduce(
        |    list_transform(range(1, length(word)+1),
        |      bci -> substr(word, CAST(bci AS INT), 1)),
        |    (ba, bb) -> ba || chr(1) || bb) AS state FROM w),
        |""".stripMargin
        + (1 to 6).map(bpeStage(_, "s.word, ")).mkString(",\n") + ",\n"
        + """a AS (
        |  SELECT tok, CAST(sum(cnt) AS BIGINT) AS corpus_freq,
        |         CAST(count(DISTINCT word) AS BIGINT) AS n_words
        |  FROM (SELECT word, cnt, unnest(string_split(state, chr(1))) AS tok
        |        FROM s6)
        |  GROUP BY tok),
        |t AS (
        |  SELECT tok, CAST(length(tok) AS BIGINT) AS tok_len, corpus_freq,
        |         n_words,
        |         CAST(sum(length(tok) * corpus_freq) OVER () AS BIGINT)
        |           AS total_chars
        |  FROM a)
        |SELECT tok, tok_len, corpus_freq, n_words,
        |  tok_len * corpus_freq * 1000000 // total_chars AS char_ppm
        |FROM t ORDER BY corpus_freq DESC, tok ASC""".stripMargin),
  )
}
