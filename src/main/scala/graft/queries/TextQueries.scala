package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over `documents` — the
  * training-data-pipeline surface (token counting, quality scoring,
  * language ID, fingerprinting, exact + similarity dedup). The
  * reference's string surface (split/format/concat parsing of trial
  * lists, SURVEY §2.7) is exercised by the same functions.
  *
  * Scale notes: everything here is per-row (embarrassingly parallel)
  * except q25, which joins on a blocking key (lang, source) — the
  * standard entity-resolution trick that bounds candidate pairs to
  * within-block instead of O(n²) corpus-wide. MinHash-LSH (the
  * probabilistic scale path) lives in operators/Dedup.scala.
  */
object TextQueries extends QueryPack {
  import Q._

  private val STOP_EN = "\\b(the|and|of|to|in|is|a)\\b"
  private val STOP_ES = "\\b(el|la|de|que|los|una)\\b"
  private val STOP_DE = "\\b(der|die|und|das|ein|nicht)\\b"
  private val STOP_FR = "\\b(le|les|des|une|est|dans)\\b"

  val queries = Map[String, Fn](
    // Token counting: whitespace tokenization + a BPE-ish regex
    // (GPT-2-style pre-tokenizer shape: contractions, space-prefixed
    // letter/digit runs, punctuation runs — RE2/Java-compatible
    // subset) + length stats.
    "q20_token_stats" -> { (s, dir) =>
      val bpe = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+"
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          size(regexp_extract_all(col("text"), lit(bpe), lit(0))).cast("long").as("n_bpe_tokens"),
          length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_nonspace"))
        .withColumn("avg_token_len",
          col("n_nonspace").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: punctuation / stopword ratios (heuristic doc
    // quality for corpus filtering).
    "q21_quality_score" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0))).cast("long").as("punct_n"),
          size(regexp_extract_all(lower(col("text")), lit(STOP_EN), lit(0))).cast("long").as("stop_n"),
          length(col("text")).cast("long").as("n_chars_m"))
        .withColumn("stop_ratio", col("stop_n").cast("double") / col("n_tokens"))
        .withColumn("punct_ratio", col("punct_n").cast("double") / col("n_chars_m"))
        .withColumn("quality", col("stop_ratio") + col("punct_ratio"))
        .orderBy(col("doc_id"))
    },

    // Language ID: stopword-hit argmax with deterministic tie-break
    // (n-gram/stopword heuristic classifier).
    "q22_langid" -> { (s, dir) =>
      val hits = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(regexp_extract_all(lower(col("text")), lit(STOP_EN), lit(0))).cast("long").as("en_n"),
          size(regexp_extract_all(lower(col("text")), lit(STOP_ES), lit(0))).cast("long").as("es_n"),
          size(regexp_extract_all(lower(col("text")), lit(STOP_DE), lit(0))).cast("long").as("de_n"),
          size(regexp_extract_all(lower(col("text")), lit(STOP_FR), lit(0))).cast("long").as("fr_n"))
      hits.withColumn("pred_lang",
          when(col("en_n") >= col("es_n") && col("en_n") >= col("de_n") && col("en_n") >= col("fr_n"), "en")
            .when(col("es_n") >= col("de_n") && col("es_n") >= col("fr_n"), "es")
            .when(col("de_n") >= col("fr_n"), "de")
            .otherwise("fr"))
        .withColumn("is_match", when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
        .select(col("doc_id"), col("en_n"), col("es_n"), col("de_n"), col("fr_n"),
          col("pred_lang"), col("is_match"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprint: whitespace-normalized md5 (content hash
    // for exact dedup across formatting variants).
    "q23_fingerprint" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .orderBy(col("doc_id"))
    },

    // Exact dedup: hash-groupBy on the normalized fingerprint,
    // keep min doc_id per group (map-side partial agg; no O(n²)).
    "q24_dedup_exact" -> { (s, dir) =>
      Tables.table(s, dir, "documents")
        .withColumn("fp", md5(lower(regexp_replace(col("text"), "\\s+", " "))))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), col("fp"))
        .orderBy(col("keep_id"))
    },

    // Near-dup pairs: exact word-set Jaccard within (lang, source)
    // blocks via the per-block kernel (operators/Dedup.scala).
    // Blocking bounds candidates; the full-scale probabilistic path is
    // MinHash-LSH (q40).
    "q25_jaccard_pairs" -> { (s, dir) =>
      graft.operators.Dedup.jaccardBlockedPairs(s,
          Tables.table(s, dir, "documents"), "doc_id", "text",
          Seq("lang", "source"), threshold = 0.8)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
          round(col("jac"), 6).as("jac_r"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // JSON extraction + aggregation over events.props (driver schema:
    // props is a JSON string {"k": int}).
    "q26_json_stats" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_k_gt50"))
        .select(col("event_type"), col("n"), col("sum_k"), col("n_k_gt50"),
          (col("sum_k").cast("double") / col("n")).as("avg_k"))
        .orderBy(col("event_type"))
    },
  )

  val oracle = Map(
    "q20_token_stats" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace
        |FROM documents)
        |SELECT doc_id, n_chars_m, n_tokens, n_bpe_tokens, n_nonspace,
        |  CAST(n_nonspace AS DOUBLE)/n_tokens AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "q21_quality_score" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_n,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS BIGINT) AS stop_n,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents)
        |SELECT doc_id, n_tokens, punct_n, stop_n, n_chars_m,
        |  CAST(stop_n AS DOUBLE)/n_tokens AS stop_ratio,
        |  CAST(punct_n AS DOUBLE)/n_chars_m AS punct_ratio,
        |  CAST(stop_n AS DOUBLE)/n_tokens + CAST(punct_n AS DOUBLE)/n_chars_m AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "q22_langid" ->
      """WITH h AS (SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS BIGINT) AS en_n,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una)\b')) AS BIGINT) AS es_n,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein|nicht)\b')) AS BIGINT) AS de_n,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|les|des|une|est|dans)\b')) AS BIGINT) AS fr_n
        |FROM documents),
        |p AS (SELECT *,
        |  CASE WHEN en_n >= es_n AND en_n >= de_n AND en_n >= fr_n THEN 'en'
        |       WHEN es_n >= de_n AND es_n >= fr_n THEN 'es'
        |       WHEN de_n >= fr_n THEN 'de'
        |       ELSE 'fr' END AS pred_lang
        |FROM h)
        |SELECT doc_id, en_n, es_n, de_n, fr_n, pred_lang,
        |  CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS BIGINT) AS is_match
        |FROM p ORDER BY doc_id""".stripMargin,

    "q23_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents
        |GROUP BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin,

    "q25_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, lang, source,
        |  list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS ws
        |FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter,
        |  CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS BIGINT) AS uni
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, inter, uni,
        |  round(CAST(inter AS DOUBLE)/uni, 6) AS jac_r
        |FROM p WHERE CAST(inter AS DOUBLE)/uni >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q26_json_stats" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_gt50
        |FROM e GROUP BY event_type)
        |SELECT event_type, n, sum_k, n_k_gt50,
        |  CAST(sum_k AS DOUBLE)/n AS avg_k
        |FROM a ORDER BY event_type""".stripMargin,
  )
}
