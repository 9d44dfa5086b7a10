package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 pack, part 3: integer-exact PCA power iteration over the
  * embedding corpus (distributed Gram matrix + driver-side BigInt
  * matrix-vector folds — the covariance-at-scale shape where the data
  * pass is one aggregation and everything iterative happens on an
  * O(d²) driver object), and a k-anonymity audit over document
  * quasi-identifiers (the re-identification risk report a governed
  * corpus release runs first).
  */
object AnalyticsQueries6 extends QueryPack {
  import Q._

  /** Count-min sketch geometry (q205): 4 hash rows × 2048 counters. */
  private val CmsRows = 4
  private val CmsW = 2048L

  /** q206's noise ladder: thresholds over the uhash range [0, P) for
    * a two-sided geometric(p=1/2) noise variable truncated to ±16.
    * mass(0)=1/3, mass(±k)=2⁻ᵏ/3 — all dyadic-over-3 rationals, so
    * every threshold floor(P·CDF(k)) is EXACT in BigInt. One builder
    * emits the CASE for BOTH engines, so parity holds by
    * construction. */
  private def geomNoiseCaseSql(uExpr: String): String = {
    val P = BigInt(4294967291L)
    val den = BigInt(3) * BigInt(65536) // 3·2^16
    var cum = BigInt(0)
    val arms = (-16 to 15).map { k =>
      val mass = if (k == 0) BigInt(65536) else BigInt(1) << (16 - math.abs(k))
      cum += mass
      s"WHEN $uExpr < ${(P * cum) / den} THEN CAST($k AS BIGINT)"
    }
    arms.mkString("CASE ", " ", " ELSE CAST(16 AS BIGINT) END")
  }

  val queries = Map[String, Fn](

    // COUNT-MIN SKETCH, audited: 4×2048 integer counters over the
    // token stream (bucket = oracled universal hash of the oracled
    // rolling hash — every ingredient already hash-matched to
    // DuckDB), built by one hash agg whose map-side combine bounds
    // every partition's contribution at 8192 running sums — the
    // mergeable-sketch scale shape, like q194's bitmap but for
    // FREQUENCIES. The exact top-20 tokens then read their estimate
    // back (min over the 4 rows) next to their exact count: CMS can
    // only overestimate, and the row shows by how much.
    "q205_countmin" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val toks = Tables.table(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .persist()
      def buckets(df: DataFrame): DataFrame = df
        .withColumn("ph", expr("rolling_hash(tok) % 4294967291"))
        .select(col("*"), explode(sequence(lit(0), lit(CmsRows - 1))).as("r"))
        .withColumn("bucket", expr(
          "pmod((pmod((20500 + r)*2654435761, 1073741824)*2+1) * ph + " +
            "pmod((20500 + r)*40503+778797, 1073741824), 4294967291) % " + CmsW))
      val cms = buckets(toks)
        .groupBy(col("r"), col("bucket"))
        .agg(count(lit(1)).as("counter"))
      // top-20 via orderBy+limit (TakeOrderedAndProject) — the rank
      // window must not be what sorts the full vocabulary; it runs
      // over just the 20 kept rows
      val top = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("exact_cnt").desc, col("tok"))).cast("long"))
      buckets(top).join(cms, Seq("r", "bucket"))
        .groupBy(col("rk"), col("tok"), col("exact_cnt"))
        .agg(min(col("counter")).as("cms_est"))
        .select(col("rk"), col("tok"), col("exact_cnt"), col("cms_est"))
        .orderBy(col("rk"))
    },

    // DIFFERENTIALLY-PRIVATE-STYLE NOISED RELEASE: the per-(type,
    // day) count series plus two-sided geometric(1/2) noise drawn
    // deterministically per cell from the oracled hash through an
    // EXACT dyadic threshold ladder (the q159 pinned-inverse-CDF
    // pattern; ladder literals generated once for both engines).
    // True and noised counts ship side by side because this is the
    // mechanism's engine test, not a privacy release — a real
    // release drops n_true and derives the noise seed from a secret.
    "q206_dp_release" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_ns DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("n_true"))
      val cellHash = "pmod(day * 1000003 + rolling_hash(event_type), 4294967291)"
      val u = "(pmod((pmod(20600*2654435761, 1073741824)*2+1) * " +
        s"$cellHash + pmod(20600*40503+778797, 1073741824), 4294967291))"
      cells
        .withColumn("noise", expr(geomNoiseCaseSql(u)))
        .select(col("event_type"), col("day"), col("n_true"), col("noise"),
          greatest(col("n_true") + col("noise"), lit(0L)).as("n_released"))
        .orderBy(col("event_type"), col("day"))
    },


    // WINNOWING FINGERPRINTS (the MOSS document-fingerprinting
    // scheme): 5-gram rolling hashes per document, then each sliding
    // window of 4 grams contributes its MINIMUM hash — the winnowed
    // fingerprint set (distinct window minima) is guaranteed to
    // sample every run of ≥ 8 shared tokens, at a fraction of the
    // full gram set's size. Gram hashes build from per-token hashes
    // with lead() (one window pass per doc — no string re-hashing per
    // gram), fingerprints bucket-join into candidate pairs, and pairs
    // sharing ≥ 2 fingerprints come out with their share count. The
    // corpus never self-joins: candidates exist only where a
    // fingerprint bucket collides.
    "q207_winnowing" -> { (s, dir) =>
      graft.functions.RollingHash.register(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val tok = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tk")))
        .select(col("doc_id"), col("pos"),
          expr("rolling_hash(tk) % 1000000007").as("th"))
      val g = tok
        .withColumn("t1", lead(col("th"), 1).over(w))
        .withColumn("t2", lead(col("th"), 2).over(w))
        .withColumn("t3", lead(col("th"), 3).over(w))
        .withColumn("t4", lead(col("th"), 4).over(w))
        .filter(col("t4").isNotNull)
        .select(col("doc_id"), col("pos"), expr(
          "((((((((th*31 + t1) % 1000000007)*31 + t2) % 1000000007)*31 + t3)" +
            " % 1000000007)*31 + t4) % 1000000007)").as("gh"))
      val frame = w.rowsBetween(0, 3)
      val fps = g
        .withColumn("fp", min(col("gh")).over(frame))
        .withColumn("wn", count(lit(1)).over(frame))
        .filter(col("wn") === 4)
        .select(col("doc_id"), col("fp")).distinct()
        .persist()
      fps.select(col("doc_id").as("ia"), col("fp"))
        .join(fps.select(col("doc_id").as("ib"), col("fp")), Seq("fp"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib"))
        .agg(count(lit(1)).as("shared_fp"))
        .filter(col("shared_fp") >= 2)
        .orderBy(col("ia"), col("ib"))
    },

    // DISTRIBUTION DRIFT AUDIT: the events value histogram compared
    // between the first and second half of the time span (the
    // train-vs-serve drift check); a bucket is flagged when its share
    // moved by more than 0.5 percentage points — decided by integer
    // cross-multiplication (|n₁N₂ − n₂N₁|·200 > N₁N₂), never a float
    // ratio. Two hash aggs and a 1-row broadcast of the half totals.
    "q208_drift_audit" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("ts_ns"), least(expr("CAST(round(value*100) AS BIGINT) DIV 2500"),
          lit(23L)).as("bucket"))
      val Array(lo, hi) = ev.agg(min(col("ts_ns")), max(col("ts_ns")))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray // 1-row scalar
      val b = lo + (hi - lo) / 2
      val halves = ev
        .withColumn("h", when(col("ts_ns") < b, lit(0L)).otherwise(lit(1L)))
        .groupBy(col("bucket"))
        .agg(sum(when(col("h") === 0, lit(1L)).otherwise(lit(0L))).as("n_first"),
          sum(col("h")).as("n_second"))
      val totals = halves.agg(sum(col("n_first")).as("tot_first"),
        sum(col("n_second")).as("tot_second"))
      halves.crossJoin(broadcast(totals))
        .select(col("bucket"), col("n_first"), col("n_second"),
          when(abs(col("n_first") * col("tot_second") -
              col("n_second") * col("tot_first")) * 200 >
            col("tot_first") * col("tot_second"), lit(1L)).otherwise(lit(0L))
            .as("drifted"))
        .orderBy(col("bucket"))
    },

    // PCA POWER ITERATION, integer-exact: embeddings quantized to
    // 1/1024 steps (round-half-up, bit-identical on both engines),
    // then ONE distributed pass builds the 64×64 Gram matrix — the
    // pair explode is 4096 cells per row but the hash agg's map-side
    // combine collapses every partition to ≤4096 running sums, so the
    // shuffle is O(partitions·d²) regardless of row count. Two power
    // iterations v₂ = G·(G·1) then run in exact BigInt ON THE DRIVER
    // (collect is the 4096-cell Gram, O(d²) — row count irrelevant).
    // Output: the unnormalized dominant-direction iterate per
    // dimension as exact decimal strings; normalization is a consumer
    // choice, exactness is ours.
    "q203_power_iteration" -> { (s, dir) =>
      val d = 64
      val cells = Tables.table(s, dir, "embeddings")
        .select(expr("transform(embedding, x -> CAST(round(x * 1024) AS BIGINT))")
          .as("qv"))
        .select(posexplode(col("qv")).as(Seq("i", "va")), col("qv"))
        .select(col("i"), col("va"), posexplode(col("qv")).as(Seq("j", "vb")))
        .groupBy(col("i"), col("j"))
        // BIGINT-safe by the quantization bound: |va·vb| ≤ 1024² ≈
        // 1.05e6, so a Gram cell wraps only past ~8.8e12 embedding
        // rows (≳20× a 100 TB embeddings table) — documented headroom,
        // not the q201 silent-wrap class.
        .agg(sum(col("va") * col("vb")).as("g"))
        .collect() // bounded: the d×d Gram (4096 longs), never the rows
      val g = Array.ofDim[BigInt](d, d)
      for (r <- cells) g(r.getInt(0))(r.getInt(1)) = BigInt(r.getLong(2))
      def mul(v: Array[BigInt]): Array[BigInt] =
        Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val v2 = mul(mul(Array.fill(d)(BigInt(1))))
      s.createDataFrame((0 until d).map(i => (i.toLong, v2(i).toString)))
        .toDF("dim", "v2").orderBy(col("dim"))
    },

    // VOCABULARY GROWTH CURVE (the Heaps'-law profile a corpus report
    // plots): docs ranked by id, each token attributed to the decile
    // where it FIRST appears (min rank per token — one hash agg over
    // the exploded stream), then the 10-row decile table carries new
    // and cumulative vocabulary next to cumulative docs. The growth
    // shape tells you whether more data still buys vocabulary — and
    // it reduces to two aggs plus a 10-row window, at any corpus
    // size.
    "q209_vocab_growth" -> { (s, dir) =>
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.expressions.{Window => W}
      val w10 = W.orderBy(col("decile")).rowsBetween(W.unboundedPreceding, 0)
      // rank = doc_id + 1: ids are dense 0..N−1 in this corpus (the
      // generator's contract, asserted by the count==max+1 guard
      // below), so the ingestion-order rank needs NO global window —
      // the one plan shape that cannot scale. A sparse-id corpus
      // would rank via Enumerate.globalRowNumber (q90's operator).
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("rank", col("doc_id") + 1)
        .persist()
      val n = docs.agg(count(lit(1)), max(col("doc_id"))).collect()(0) // 1-row scalar
      require(n.getLong(0) == n.getLong(1) + 1, "doc_id not dense")
      val nDocs = n.getLong(0)
      // nonneg operands ≪ 2^52, so double-divide + truncating cast
      // ≡ integer floor division (the oracle's `//`)
      def decile(rank: Column): Column =
        least((((rank - 1) * 10) / lit(nDocs)).cast("long") + 1, lit(10L))
      val docsPerDecile = docs.select(decile(col("rank")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("n_docs"))
      val firstSeen = docs
        .select(col("rank"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy(col("tok")).agg(min(col("rank")).as("fa"))
        .select(decile(col("fa")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("new_tokens"))
      docsPerDecile.join(firstSeen, Seq("decile"), "left")
        .select(col("decile"), col("n_docs"),
          coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
        .withColumn("docs_cum", sum(col("n_docs")).over(w10))
        .withColumn("vocab_cum", sum(col("new_tokens")).over(w10))
        .orderBy(col("decile"))
    },

    // CANONICAL SELECTION over entity clusters: the q200 fuzzy
    // clusters resolved to a disposition — each cluster keeps its
    // longest document (ties to the smallest id) and reports what the
    // dedup pass would remove. Labels come from the same q72
    // component loop; the pick is one max_by per cluster. This is the
    // last step that turns near-dup DETECTION into an actionable
    // retention decision (the q77 pipeline's shape, entity-level).
    "q210_canonical_pick" -> { (s, dir) =>
      val edges = AnalyticsQueries5.queries("q196_fuzzy_match")(s, dir)
        .select(col("id_a"), col("id_b"))
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val labels = graft.operators.Components
        .connectedComponents(docs.select(col("doc_id").as("id")), edges)
        .join(docs, col("id") === col("doc_id"))
        .select(col("comp"), col("doc_id"), col("n_chars"))
      val sized = labels.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_docs"),
          max_by(col("doc_id"), struct(col("n_chars"), (-col("doc_id")).as("nid")))
            .as("canonical_id"),
          sum(col("n_chars")).as("chars_total"),
          max(col("n_chars")).as("chars_kept"))
        .filter(col("n_docs") >= 2)
      sized.select(col("comp"), col("canonical_id"),
          (col("n_docs") - 1).as("n_removed"),
          (col("chars_total") - col("chars_kept")).as("chars_removed"))
        .orderBy(col("comp"))
    },

    // K-ANONYMITY AUDIT: quasi-identifier = (lang, source, length
    // bucket); for each candidate k, how many QI groups fall below it
    // and how many documents those groups expose. One hash agg builds
    // the QI histogram; the threshold sweep is an explode over four
    // constants on the (tiny) group table. The release rule "suppress
    // groups under k" reads its cost straight off this report.
    "q204_kanon_audit" -> { (s, dir) =>
      val groups = Tables.table(s, dir, "documents")
        .groupBy(col("lang"), col("source"),
          expr("n_chars DIV 256").as("len_bucket"))
        .agg(count(lit(1)).as("cnt"))
      groups
        .select(col("cnt"), explode(array(lit(2L), lit(5L), lit(10L), lit(20L))).as("k"))
        .groupBy(col("k"))
        .agg(count(when(col("cnt") < col("k"), lit(1))).as("n_groups_below"),
          coalesce(sum(when(col("cnt") < col("k"), col("cnt"))), lit(0L))
            .as("n_docs_at_risk"),
          count(lit(1)).as("n_groups_total"))
        .orderBy(col("k"))
    }
  )

  override def oracle: Map[String, String] = Map(

    "q205_countmin" -> {
      val ph = Q.polyHashSql("tok")
      def bucket(iExpr: String) =
        s"(${Q.uhashSql(iExpr, "ph")} % $CmsW)"
      s"""WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        |    FROM documents),
        |tb AS (SELECT tok, $ph % 4294967291 AS ph FROM toks),
        |cms AS (SELECT rr.r AS r, ${bucket("(20500 + rr.r)")} AS bucket,
        |    CAST(count(*) AS BIGINT) AS counter
        |  FROM tb, range(0, $CmsRows) rr(r)
        |  GROUP BY 1, 2),
        |ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY tok),
        |top AS (SELECT tok, exact_cnt,
        |    CAST(row_number() OVER (ORDER BY exact_cnt DESC, tok) AS BIGINT) AS rk
        |  FROM ex QUALIFY rk <= 20),
        |tt AS (SELECT top.rk, top.tok, top.exact_cnt, rr.r AS r,
        |    ${bucket("(20500 + rr.r)")} AS bucket
        |  FROM (SELECT top.*, $ph % 4294967291 AS ph FROM top) top, range(0, $CmsRows) rr(r))
        |SELECT tt.rk, tt.tok, tt.exact_cnt,
        |  CAST(min(cms.counter) AS BIGINT) AS cms_est
        |FROM tt JOIN cms ON cms.r = tt.r AND cms.bucket = tt.bucket
        |GROUP BY 1, 2, 3 ORDER BY tt.rk""".stripMargin
    },

    "q206_dp_release" -> {
      val cellHash = s"((day * 1000003 + ${Q.polyHashSql("event_type")}) % 4294967291)"
      val u = Q.uhashSql("20600", cellHash)
      s"""WITH cells AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n_true
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, day, n_true,
        |    ${geomNoiseCaseSql(u)} AS noise
        |  FROM cells)
        |SELECT event_type, CAST(day AS BIGINT) AS day, n_true, noise,
        |  greatest(n_true + noise, 0) AS n_released
        |FROM n ORDER BY event_type, day""".stripMargin
    },

    // Token positions via the q188 struct_pack-over-range trick
    // (DuckDB has no WITH ORDINALITY); gram/winnow windows mirror the
    // Spark plan frame for frame.
    "q207_winnowing" -> {
      val ph = Q.polyHashSql("p.tk")
      s"""WITH toks0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        |    FROM documents),
        |tok0 AS (SELECT doc_id, unnest(list_transform(range(1, len(l)+1),
        |    wpi -> struct_pack(pos := wpi, tk := l[CAST(wpi AS INT)]))) AS p
        |  FROM toks0),
        |tok AS (SELECT doc_id, p.pos AS pos, $ph % 1000000007 AS th FROM tok0),
        |g AS (SELECT doc_id, pos,
        |    ((((((((th*31 + t1) % 1000000007)*31 + t2) % 1000000007)*31 + t3)
        |      % 1000000007)*31 + t4) % 1000000007) AS gh
        |  FROM (SELECT doc_id, pos, th,
        |      lead(th,1) OVER w AS t1, lead(th,2) OVER w AS t2,
        |      lead(th,3) OVER w AS t3, lead(th,4) OVER w AS t4
        |    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
        |  WHERE t4 IS NOT NULL),
        |wmin AS (SELECT doc_id, min(gh) OVER wf AS fp, count(*) OVER wf AS wn
        |  FROM g WINDOW wf AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
        |fps AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE wn = 4)
        |SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS shared_fp
        |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY ia, ib""".stripMargin
    },

    "q208_drift_audit" ->
      """WITH bd AS (SELECT min(epoch_ns(ts)) +
        |    (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS b FROM events),
        |e AS (SELECT least(CAST(round(value*100) AS BIGINT) // 2500, 23) AS bucket,
        |    CASE WHEN epoch_ns(ts) < bd.b THEN 0 ELSE 1 END AS h
        |  FROM events, bd),
        |halves AS (SELECT bucket,
        |    CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |    CAST(sum(h) AS BIGINT) AS n_second
        |  FROM e GROUP BY bucket),
        |tot AS (SELECT CAST(sum(n_first) AS BIGINT) AS tf,
        |    CAST(sum(n_second) AS BIGINT) AS ts FROM halves)
        |SELECT bucket, n_first, n_second,
        |  CAST(CASE WHEN abs(n_first * tot.ts - n_second * tot.tf) * 200 >
        |      tot.tf * tot.ts THEN 1 ELSE 0 END AS BIGINT) AS drifted
        |FROM halves, tot ORDER BY bucket""".stripMargin,

    // range(1,65) indexes both axes; HUGEINT keeps every product
    // exact (v₂ ≤ ~2e21 « int128). The same quantized integers feed
    // the same two matrix-vector folds the Scala BigInt code runs.
    "q203_power_iteration" ->
      """WITH q AS (SELECT list_transform(embedding,
        |    x -> CAST(round(x * 1024) AS BIGINT)) AS qv FROM embeddings),
        |g AS (SELECT r1.i AS i, r2.j AS j,
        |    CAST(sum(qv[CAST(r1.i AS INT)] * qv[CAST(r2.j AS INT)]) AS HUGEINT) AS g
        |  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
        |  GROUP BY 1, 2),
        |v1 AS (SELECT j, CAST(sum(g) AS HUGEINT) AS s
        |  FROM g GROUP BY j),
        |v2 AS (SELECT g.i, CAST(sum(g.g * v1.s) AS HUGEINT) AS v
        |  FROM g JOIN v1 ON g.j = v1.j GROUP BY g.i)
        |SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(v AS VARCHAR) AS v2
        |FROM v2 ORDER BY dim""".stripMargin,

    "q209_vocab_growth" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |docs AS (SELECT doc_id + 1 AS rank, text FROM documents),
        |dd AS (SELECT least(((rank - 1) * 10) // nn.n + 1, 10) AS decile
        |  FROM docs, nn),
        |dpd AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM dd GROUP BY 1),
        |tk AS (SELECT rank, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM docs),
        |fs0 AS (SELECT tok, min(rank) AS fa FROM tk GROUP BY tok),
        |fs AS (SELECT least(((fa - 1) * 10) // nn.n + 1, 10) AS decile,
        |    CAST(count(*) AS BIGINT) AS new_tokens
        |  FROM fs0, nn GROUP BY 1)
        |SELECT CAST(dpd.decile AS BIGINT) AS decile, dpd.n_docs,
        |  coalesce(fs.new_tokens, 0) AS new_tokens,
        |  CAST(sum(dpd.n_docs) OVER wc AS BIGINT) AS docs_cum,
        |  CAST(sum(coalesce(fs.new_tokens, 0)) OVER wc AS BIGINT) AS vocab_cum
        |FROM dpd LEFT JOIN fs ON dpd.decile = fs.decile
        |WINDOW wc AS (ORDER BY dpd.decile
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY decile""".stripMargin,

    "q210_canonical_pick" ->
      """WITH RECURSIVE d AS (SELECT doc_id, lang, split_part(text, ' ', 1) AS t1,
        |    substr(text, 1, 40) AS p FROM documents),
        |e0 AS (SELECT a.doc_id AS ia, b.doc_id AS ib
        |  FROM d a JOIN d b ON a.lang = b.lang AND a.t1 = b.t1
        |    AND a.doc_id < b.doc_id
        |  WHERE levenshtein(a.p, b.p) <= 15),
        |e AS (SELECT ia AS a, ib AS b FROM e0
        |  UNION ALL SELECT ib, ia FROM e0),
        |r AS (SELECT DISTINCT a AS node, a AS label FROM e
        |  UNION
        |  SELECT e.b, r.label FROM r JOIN e ON e.a = r.node),
        |lab0 AS (SELECT node, min(label) AS comp FROM r GROUP BY node),
        |lab AS (SELECT dd.doc_id, coalesce(lab0.comp, dd.doc_id) AS comp,
        |    dd.n_chars
        |  FROM documents dd LEFT JOIN lab0 ON lab0.node = dd.doc_id),
        |pick AS (SELECT comp, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY comp
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM lab),
        |agg AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |    CAST(max(n_chars) AS BIGINT) AS chars_kept
        |  FROM lab GROUP BY comp)
        |SELECT agg.comp, pick.doc_id AS canonical_id,
        |  agg.n_docs - 1 AS n_removed,
        |  agg.chars_total - agg.chars_kept AS chars_removed
        |FROM agg JOIN pick ON pick.comp = agg.comp AND pick.rk = 1
        |WHERE agg.n_docs >= 2 ORDER BY agg.comp""".stripMargin,

    "q204_kanon_audit" ->
      """WITH g AS (SELECT lang, source, n_chars // 256 AS len_bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |k AS (SELECT unnest([2, 5, 10, 20]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(count(CASE WHEN cnt < k THEN 1 END) AS BIGINT) AS n_groups_below,
        |  CAST(coalesce(sum(CASE WHEN cnt < k THEN cnt END), 0) AS BIGINT)
        |    AS n_docs_at_risk,
        |  CAST(count(*) AS BIGINT) AS n_groups_total
        |FROM g, k GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
