package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector / embedding operators over `embeddings` (Array[Float], 64-d):
  * brute-force cosine top-k (the exact ANN baseline) and per-label
  * norm statistics. The LSH-bucketed approximate path lives in
  * operators/Similarity.scala.
  *
  * Scale notes: the query set is broadcast (small side), the corpus
  * streams — no shuffle of the corpus; per-row dot products stay
  * inside whole-stage codegen (functions.aggregate/zip_with, no UDF).
  * Sums across rows use the integer-scaling policy (see Q).
  */
object VectorQueries extends QueryPack {
  import Q._

  /** Σ aᵢ·bᵢ as a strict left fold — same IEEE order as the oracle;
    * native codegen'd expression (graft.functions.DotProduct). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotp(a, b)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("vd", transform(col("embedding"), x => x.cast("double")))
      .withColumn("n2", dot(col("vd"), col("vd")))

  /** Deterministic k-seed pick + per-row argmin cluster assignment —
    * the shared machinery of q99 (one Lloyd step) and q141 (SemDeDup
    * clustering): the k smallest (uhash(vec_id), vec_id) rows become
    * seeds packed into ONE broadcast row; assignment is per-row
    * array_min over (squared-dist, cid) structs — map-only, the
    * corpus never shuffles, no driver collect anywhere. */
  private val SeedFamily = 9900 // pinned: q99 + q141 oracles both derive from it
  private val SeedK = 8

  private def seedAssign(s: SparkSession, dir: String): DataFrame = {
    val (ha, hb) = graft.operators.Dedup.affine(SeedFamily)
    val emb = withNorm(Tables.table(s, dir, "embeddings"))
    val seeds = emb
      .withColumn("hk", pmod(lit(ha) * pmod(col("vec_id"), lit(4294967291L)) + lit(hb),
        lit(4294967291L)))
      .orderBy(col("hk"), col("vec_id")).limit(SeedK)
      .select(col("vec_id").as("cid"), col("vd").as("se"))
      .agg(collect_list(struct(col("cid"), col("se"))).as("seeds"))
    emb.crossJoin(broadcast(seeds))
      .withColumn("best", array_min(transform(col("seeds"), sd =>
        struct(
          aggregate(zip_with(col("vd"), sd.getField("se"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v).as("dist"),
          sd.getField("cid").as("cid")))))
      .select(col("vec_id"), col("best.cid").as("cluster_id"),
        col("embedding"), col("vd"), col("n2"))
  }

  /** Brute-force cosine top-10 for every 50th vector (exact ANN
    * baseline; corpus-side scan, broadcast queries). Shared by q27
    * and the q131 recall audit. */
  private def exactTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(Tables.table(s, dir, "embeddings"))
    val qs = graft.operators.Similarity.boundedQueries(
        emb.filter(col("vec_id") % 50 === 0),
        graft.operators.Similarity.DefaultMaxQueries, "q27")
      .select(col("vec_id").as("qid"), col("vd").as("qv"), col("n2").as("qn2"))
    val corpus = emb.select(col("vec_id").as("cid"), col("vd").as("cv"), col("n2").as("cn2"))
    corpus.join(broadcast(qs), col("cid") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (sqrt(col("qn2")) * sqrt(col("cn2"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cos_r"))
      .orderBy(col("qid"), col("rank"))
  }

  val queries = Map[String, Fn](
    "q27_cosine_topk" -> { (s, dir) => exactTopK(s, dir) },

    // INDEX-QUALITY audit: recall@10 of the IVF index (nprobe=1)
    // against the exact baseline, per query — the measurement run
    // before committing (codebook size, nprobe) to a full-corpus
    // deployment, exactly like q105 calibrates the MinHash sketch.
    // Both sides are existing plans; the audit itself is one
    // (qid, cid) equi-join + per-query count. Deterministic end to
    // end, so even the recall VALUES are oracle-checkable.
    "q131_ann_recall" -> { (s, dir) =>
      val exact = exactTopK(s, dir).select(col("qid"), col("cid"))
      val ivf = graft.operators.Similarity
        .ivfTopK(s, Tables.table(s, dir, "embeddings"), k = 10)
        .select(col("qid"), col("cid"))
      val hits = ivf.join(exact, Seq("qid", "cid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      exact.select(col("qid")).distinct()
        .join(hits, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / 10.0).as("recall_at_10"))
        .orderBy(col("qid"))
    },

    // IVF-PQ composite ANN (the FAISS IVFPQ shape, by_residual=false):
    // coarse cells prune candidates (nprobe=2), PQ codes compress the
    // distance math (ADC) — the full 100 TB index recipe in one plan.
    // Deterministic end to end, oracled by composing the q52 cell
    // CTEs with the q78 PQ CTEs.
    "q136_ivfpq_topk" -> { (s, dir) =>
      graft.operators.Similarity.ivfPqTopK(
          s, Tables.table(s, dir, "embeddings"), k = 10, nprobe = 2)
        .orderBy(col("qid"), col("rank"))
    },

    // Per-label embedding norm statistics (exact scaled-integer avg).
    "q28_embedding_norms" -> { (s, dir) =>
      withNorm(Tables.table(s, dir, "embeddings"))
        .withColumn("norm", sqrt(col("n2")))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
             microsSum(col("norm")).as("norm_u"),
             max(col("norm")).as("max_norm0"),
             min(col("norm")).as("min_norm0"))
        .select(col("label").cast("long").as("label"), col("n"),
          (col("norm_u").cast("double") / 1000000.0 / col("n")).as("avg_norm"),
          round(col("max_norm0"), 6).as("max_norm"),
          round(col("min_norm0"), 6).as("min_norm"))
        .orderBy(col("label"))
    },

    // Nearest-prototype classification (the embedding-eval shape:
    // class centroids → argmin-distance assignment → confusion
    // matrix). Centroids are EXACT: per-(label, dim) integer-scaled
    // sums (order-independent longs, map-side partials over the
    // posexplode), one double division each — so the broadcast
    // prototype matrix is bit-identical on every run and engine. The
    // collect is labels×dims (bounded by the label vocabulary, never
    // the corpus); assignment is a one-pass kernel with the same
    // 0-seeded j-ascending distance fold as the PQ/ANN family.
    "q81_prototype_classify" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      val centRows = emb
        .select(col("label").cast("int").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(round(col("x").cast("double") * 1e6).cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .collect()
      val labels: Array[Int] = centRows.map(_.getInt(0)).distinct.sorted
      val dim = centRows.map(_.getInt(1)).max + 1
      val cents: Array[Array[Double]] = {
        val m = Array.ofDim[Double](labels.length, dim)
        val idx = labels.zipWithIndex.toMap
        centRows.foreach { r =>
          m(idx(r.getInt(0)))(r.getInt(1)) =
            r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e6)
        }
        m
      }
      val bcC = s.sparkContext.broadcast((labels, cents))
      emb.select(col("vec_id").cast("long"), col("embedding"), col("label").cast("int"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, Array[Float], Int)]
        .mapPartitions { it =>
          val (ls, cs) = bcC.value
          it.map { case (id, v, lbl) =>
            var best = 0; var bestD = Double.MaxValue
            var li = 0
            while (li < ls.length) {
              val c = cs(li)
              var dsum = 0.0; var j = 0
              while (j < c.length && j < v.length) {
                val diff = v(j).toDouble - c(j); dsum += diff * diff; j += 1
              }
              // strict < with labels ascending ⇒ min label on ties
              if (dsum < bestD) { bestD = dsum; best = ls(li) }
              li += 1
            }
            (id, lbl, best)
          }
        }
        .toDF("vec_id", "label", "pred_label")
        .groupBy(col("label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred_label"))
    },

    // Int8-QUANTIZED brute-force ANN (the memory-bound scale lever
    // before PQ: 4× smaller corpus residency, integer dot products).
    // Per-vector symmetric quantization q = round(x·127/max|x|), scan
    // scores = int-dot × the two scales. The int dot is EXACT long
    // arithmetic (|q| ≤ 127, 64 dims ⇒ ≤ 2²⁰, no overflow), so unlike
    // a float-accumulated scan the result is order-independent and
    // oracle-matchable bit-for-bit; the only doubles are the two
    // per-vector scales applied once per pair. Same broadcast-queries
    // / stream-corpus shape as q27; PQ (q78) is the next rung where
    // even the int codes stop fitting.
    "q88_quantized_ann" -> { (s, dir) =>
      val emb = Tables.table(s, dir, "embeddings")
        .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
        .withColumn("mx", aggregate(col("vd"), lit(0.0), (a, x) => greatest(a, abs(x))))
        .withColumn("qarr", transform(col("vd"), x =>
          when(col("mx") === 0.0, lit(0L))
            .otherwise(round(x * 127.0 / col("mx")).cast("long"))))
        .withColumn("scale", col("mx") / 127.0)
      val qs = graft.operators.Similarity.boundedQueries(
          emb.filter(col("vec_id") % 50 === 0),
          graft.operators.Similarity.DefaultMaxQueries, "q88")
        .select(col("vec_id").as("qid"), col("qarr").as("qv"), col("scale").as("qscale"))
      val corpus = emb.select(col("vec_id").as("cid"), col("qarr").as("cv"),
        col("scale").as("cscale"))
      corpus.join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("dot_q",
          aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
            lit(0L), (acc, v) => acc + v))
        .withColumn("score", col("dot_q").cast("double") * col("qscale") * col("cscale"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("cid"), col("dot_q"),
          round(col("score"), 6).as("score_r"))
        .orderBy(col("qid"), col("rank"))
    },

    // One K-MEANS (Lloyd) iteration — the codebook-training step that
    // feeds the IVF index (q52/q69): the replacement for "collect a
    // corpus-sized sample to the driver" is exactly this, k-means over
    // a BOUNDED deterministic sample. Seeds = the k=8 vectors with the
    // smallest universal hash of vec_id (family 9900 — a fixed-size
    // sample whatever the corpus size), packed into ONE broadcast row
    // of struct<cid, se> — no driver collect anywhere in the plan.
    // Assignment is per-row array algebra (array_min over the seed
    // array of (dist, cid) structs ≡ argmin with min-cid ties), so the
    // corpus never shuffles; the update step posexplodes to
    // (cluster, dim) and hash-aggregates integer-scaled sums (exact,
    // order-independent longs; ≤ k·dim groups, map-side partials).
    // Emitted centroids are one double division of exact longs —
    // bit-identical on every engine. dim is 0-based.
    "q99_kmeans_iter" -> { (s, dir) =>
      val assigned = seedAssign(s, dir)
        .select(col("cluster_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      assigned.groupBy(col("cluster_id"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x").cast("double") * 1e6).cast("long")).as("sm"))
        .select(col("cluster_id"), col("dim").cast("long").as("dim"), col("n"),
          col("sm"),
          (col("sm").cast("double") / (col("n").cast("double") * 1e6)).as("cent"))
        .orderBy(col("cluster_id"), col("dim"))
    },

    // SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023): cluster the
    // embedding space, then flag near-duplicates ONLY within a
    // cluster — the clustering bounds the quadratic so the corpus
    // never all-pairs itself. Assignment reuses the q99 machinery
    // (one broadcast row of k=8 deterministic seeds, per-row argmin —
    // map-only, no corpus shuffle); the within-cluster pair join is
    // a hash join keyed on cluster_id. Keep policy: a vector
    // survives unless a LOWER-id cluster-mate sits above the cosine
    // threshold — deterministic, order-free. At 100 TB the cluster
    // count scales with the corpus (k ≈ √N keeps expected cluster
    // size √N) and hot clusters split recursively; the τ=0.3
    // threshold here is fixture-calibrated (the synthetic corpus'
    // cosine mass sits in ±0.5).
    "q141_semdedup" -> { (s, dir) =>
      val assigned = seedAssign(s, dir) // q99's seed family + argmin
        .select(col("vec_id"), col("cluster_id"), col("vd"), col("n2"))
      val mates = assigned.select(col("cluster_id"), col("vec_id").as("bid"),
        col("vd").as("bvd"), col("n2").as("bn2"))
      val dups = assigned.join(mates, Seq("cluster_id"))
        .filter(col("bid") < col("vec_id"))
        .withColumn("cos", dot(col("vd"), col("bvd"))
          / (sqrt(col("n2")) * sqrt(col("bn2"))))
        .filter(col("cos") > 0.3)
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_dups"))
      assigned.select(col("vec_id"), col("cluster_id"))
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          when(coalesce(col("n_dups"), lit(0L)) === 0, 1L).otherwise(0L).as("keep"))
        .orderBy(col("vec_id"))
    },

    // MINORITY-CLASS BALANCING (downsample every label to the
    // smallest class size — the deterministic class-balance step
    // before training a classifier on skewed labels): per-label
    // counts → 1-row broadcast min → per-label hash-ordered
    // row_number keeps exactly m rows per label. The hash order is
    // the same universal-hash deterministic shuffle as q49/q117/q125,
    // so every engine/partitioning picks the same rows; the per-label
    // window is lang-partitioned (no global bottleneck).
    "q150_label_balance" -> { (s, dir) =>
      val (ha, hb) = graft.operators.Dedup.affine(15000)
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .withColumn("hk", pmod(lit(ha) * pmod(col("vec_id"), lit(4294967291L)) + lit(hb),
          lit(4294967291L)))
      val minRow = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("m"))
      val w = Window.partitionBy(col("label")).orderBy(col("hk"), col("vec_id"))
      emb.withColumn("rk", row_number().over(w).cast("long"))
        .crossJoin(broadcast(minRow))
        .filter(col("rk") <= col("m"))
        .select(col("label"), col("rk"), col("vec_id"))
        .orderBy(col("label"), col("rk"))
    },

    // HARD-NEGATIVE MINING (contrastive training-pair construction):
    // for each query vector, the top-5 most similar corpus vectors
    // carrying a DIFFERENT label — the negatives that sit closest to
    // the decision boundary. Same broadcast-queries / streaming-
    // corpus shape as q27 (the label inequality rides the join
    // condition, so only cross-label pairs are scored); the bucketed
    // family (q43/q52) is the pruning path at full scale.
    "q142_hard_negatives" -> { (s, dir) =>
      val emb = withNorm(Tables.table(s, dir, "embeddings"))
      val qs = graft.operators.Similarity.boundedQueries(
          emb.filter(col("vec_id") % 50 === 0),
          graft.operators.Similarity.DefaultMaxQueries, "q142")
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("vd").as("qv"), col("n2").as("qn2"))
      val corpus = emb.select(col("vec_id").as("cid"), col("label").as("clabel"),
        col("vd").as("cv"), col("n2").as("cn2"))
      corpus.join(broadcast(qs), col("clabel") =!= col("qlabel"))
        .withColumn("cos", dot(col("qv"), col("cv"))
          / (sqrt(col("qn2")) * sqrt(col("cn2"))))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid")))
          .cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cos_r"))
        .orderBy(col("qid"), col("rank"))
    },
  )

  /** Oracle-side strict-left-fold dot product over double-cast lists
    * (mirrors `dot` exactly: 0.0-seeded fold ≡ fold from first elem). */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)), (x,y) -> x+y)"

  val oracle = Map(
    "q27_cosine_topk" ->
      s"""WITH n AS (SELECT vec_id, embedding,
         |  ${sqlDot("embedding", "embedding")} AS n2
         |FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM n WHERE vec_id % 50 = 0),
         |p AS (SELECT qid, c.vec_id AS cid,
         |  ${sqlDot("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
         |FROM q JOIN n c ON c.vec_id <> qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM p)
         |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, round(cos, 6) AS cos_r
         |FROM r WHERE rn <= 10 ORDER BY qid, rank""".stripMargin,

    // Composition of the q27 exact SQL and the q52 IVF SQL (both
    // already hash-match their Spark plans, so their per-qid top-10
    // SETS are pinned); the audit is one equi-join + per-qid count.
    // n_hits is BIGINT on both sides; recall = n_hits/10.0.
    "q131_ann_recall" -> {
      val uh = Q.uhashSql("5000", "vec_id % 4294967291")
      s"""WITH n AS (SELECT vec_id, embedding,
         |    ${sqlDot("embedding", "embedding")} AS n2
         |  FROM embeddings),
         |xq AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM n WHERE vec_id % 50 = 0),
         |xp AS (SELECT qid, c.vec_id AS cid,
         |    ${sqlDot("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
         |  FROM xq JOIN n c ON c.vec_id <> qid),
         |xr AS (SELECT qid, cid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM xp),
         |exact AS (SELECT qid, cid FROM xr WHERE rn <= 10),
         |cb AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  ORDER BY $uh, vec_id LIMIT 64),
         |asg AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${Q.sqlDotD("c.ce", "e.embedding")} DESC, c.cent_id) AS arn
         |  FROM embeddings e CROSS JOIN cb c),
         |v AS (SELECT vec_id, embedding, cent_id AS cell,
         |    ${Q.sqlDotD("embedding", "embedding")} AS n2
         |  FROM asg WHERE arn = 1),
         |iq AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2, cell AS qc
         |  FROM v WHERE vec_id % 50 = 0),
         |ip AS (SELECT qid, c.vec_id AS cid,
         |    ${Q.sqlDotD("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
         |  FROM iq JOIN v c ON c.cell = qc AND c.vec_id <> qid),
         |ir AS (SELECT qid, cid,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM ip),
         |ivf AS (SELECT qid, cid FROM ir WHERE rn <= 10),
         |hits AS (SELECT i.qid, count(*) AS n_hits
         |  FROM ivf i JOIN exact x ON x.qid = i.qid AND x.cid = i.cid GROUP BY 1)
         |SELECT allq.qid,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE)/10.0 AS recall_at_10
         |FROM (SELECT DISTINCT qid FROM exact) allq
         |LEFT JOIN hits h ON h.qid = allq.qid
         |ORDER BY allq.qid""".stripMargin
    },

    // q52's coarse-cell CTEs (family 5000) composed with q78's PQ
    // CTEs (family 6000): candidates = corpus rows whose cell is one
    // of the query's nprobe=2 best, distance = ADC over the 8×16 LUT.
    "q136_ivfpq_topk" -> {
      val uh5 = Q.uhashSql("5000", "vec_id % 4294967291")
      val uh6 = Q.uhashSql("6000", "(vec_id % 4294967291)")
      s"""WITH cb5 AS (
         |  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
         |  ORDER BY $uh5, vec_id LIMIT 64),
         |asg AS (
         |  SELECT e.vec_id, c.cent_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${Q.sqlDotD("c.ce", "e.embedding")} DESC, c.cent_id) AS arn
         |  FROM embeddings e CROSS JOIN cb5 c),
         |cell AS (SELECT vec_id, cent_id AS cell FROM asg WHERE arn = 1),
         |probe AS (SELECT vec_id AS qid, cent_id AS pcell FROM asg
         |  WHERE vec_id % 50 = 0 AND arn <= 2),
         |cb6 AS (
         |  SELECT cent_k, embedding FROM (
         |    SELECT embedding,
         |      row_number() OVER (ORDER BY $uh6, vec_id) - 1 AS cent_k
         |    FROM embeddings) WHERE cent_k < 16),
         |sd AS (
         |  SELECT e.vec_id, pqm.m, cb6.cent_k,
         |    list_reduce(list_transform(range(1, len(e.embedding)//8 + 1), pqj ->
         |      (CAST(e.embedding[CAST(pqm.m*(len(e.embedding)//8) + pqj AS INT)] AS DOUBLE)
         |         - CAST(cb6.embedding[CAST(pqm.m*(len(e.embedding)//8) + pqj AS INT)] AS DOUBLE))
         |      * (CAST(e.embedding[CAST(pqm.m*(len(e.embedding)//8) + pqj AS INT)] AS DOUBLE)
         |         - CAST(cb6.embedding[CAST(pqm.m*(len(e.embedding)//8) + pqj AS INT)] AS DOUBLE))),
         |      (pqx, pqy) -> pqx + pqy) AS dist
         |  FROM embeddings e, range(0, 8) pqm(m), cb6),
         |codes AS MATERIALIZED (
         |  SELECT vec_id AS cid, list(cent_k ORDER BY m) AS code FROM (
         |    SELECT vec_id, m, cent_k,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cent_k) AS rn
         |    FROM sd) WHERE rn = 1 GROUP BY vec_id),
         |luts AS MATERIALIZED (
         |  SELECT vec_id AS qid, list(dist ORDER BY m, cent_k) AS lut
         |  FROM sd WHERE vec_id % 50 = 0 GROUP BY vec_id),
         |adc AS (
         |  SELECT l.qid, c.cid,
         |    list_reduce(list_transform(range(0, 8), pqm ->
         |      lut[CAST(pqm*16 AS INT) + code[CAST(pqm AS INT) + 1] + 1]),
         |      (pqx, pqy) -> pqx + pqy) AS adc
         |  FROM luts l
         |  JOIN probe p ON p.qid = l.qid
         |  JOIN cell cl ON cl.cell = p.pcell
         |  JOIN codes c ON c.cid = cl.vec_id
         |  WHERE c.cid <> l.qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rn
         |      FROM adc)
         |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, round(adc, 6) AS adc_r
         |FROM r WHERE rn <= 10 ORDER BY qid, rank""".stripMargin
    },

    "q28_embedding_norms" ->
      s"""WITH n AS (SELECT label, sqrt(${sqlDot("embedding", "embedding")}) AS norm
         |FROM embeddings),
         |a AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
         |  CAST(sum(CAST(round(norm*1e6) AS BIGINT)) AS BIGINT) AS norm_u,
         |  max(norm) AS max_norm0, min(norm) AS min_norm0
         |FROM n GROUP BY label)
         |SELECT label, n,
         |  CAST(norm_u AS DOUBLE)/1000000.0/n AS avg_norm,
         |  round(max_norm0, 6) AS max_norm, round(min_norm0, 6) AS min_norm
         |FROM a ORDER BY label""".stripMargin,

    // Mirrors q81: integer-scaled centroid sums, one double division,
    // j-ascending 0-seeded distance folds, (dist, label) argmin. Dims
    // are derived from len(embedding) (as q43 does) so a re-generated
    // fixture with a different width errors loudly instead of silently
    // truncating the oracle's distance sums.
    "q81_prototype_classify" ->
      """WITH ex AS (
        |  SELECT CAST(label AS INT) AS label,
        |    generate_subscripts(embedding, 1) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |cs AS (
        |  SELECT label, dim,
        |    CAST(sum(CAST(round(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS BIGINT) AS sm,
        |    count(*) AS n
        |  FROM ex GROUP BY 1, 2),
        |cl AS (
        |  SELECT label,
        |    list(CAST(sm AS DOUBLE)/(CAST(n AS DOUBLE)*1e6) ORDER BY dim) AS cent
        |  FROM cs GROUP BY 1),
        |a AS (
        |  SELECT e.vec_id, CAST(e.label AS INT) AS true_label, c.label AS cand,
        |    list_reduce(list_transform(range(1, len(e.embedding)+1), pcj ->
        |      (CAST(e.embedding[pcj] AS DOUBLE) - cent[pcj])
        |      * (CAST(e.embedding[pcj] AS DOUBLE) - cent[pcj])),
        |      (pcx, pcy) -> pcx + pcy) AS dist
        |  FROM embeddings e, cl c),
        |p AS (SELECT vec_id, true_label, cand,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cand) AS rn
        |  FROM a)
        |SELECT true_label AS label, cand AS pred_label, count(*) AS n
        |FROM p WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors q88: max|x| as an unseeded fold over abs values (≡ the
    // kernel's 0.0-seeded greatest fold since abs ≥ 0), half-away-
    // from-zero round on the same (x*127.0)/mx double tree, exact long
    // dot, score = CAST(dot AS DOUBLE) * qscale * cscale left-to-right.
    "q88_quantized_ann" ->
      """WITH n AS (SELECT vec_id,
        |    list_transform(embedding, q8x -> CAST(q8x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |m AS (SELECT vec_id, vd,
        |    list_reduce(list_transform(vd, q8a -> abs(q8a)),
        |      (q8u, q8w) -> greatest(q8u, q8w)) AS mx
        |  FROM n),
        |q8 AS (SELECT vec_id,
        |    list_transform(vd, q8y -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(round(q8y*127.0/mx) AS BIGINT) END) AS qarr,
        |    mx/127.0 AS scale
        |  FROM m),
        |qq AS (SELECT vec_id AS qid, qarr AS qv, scale AS qscale
        |  FROM q8 WHERE vec_id % 50 = 0),
        |p AS (SELECT qid, c.vec_id AS cid,
        |    list_reduce(list_transform(range(1, len(qv)+1),
        |      q8i -> qv[q8i] * c.qarr[q8i]), (q8s, q8t) -> q8s + q8t) AS dot_q,
        |    qscale, c.scale AS cscale
        |  FROM qq JOIN q8 c ON c.vec_id <> qid),
        |r AS (SELECT qid, cid, dot_q,
        |    CAST(dot_q AS DOUBLE) * qscale * cscale AS score FROM p),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn
        |  FROM r)
        |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, dot_q, round(score, 6) AS score_r
        |FROM rk WHERE rn <= 10 ORDER BY qid, rank""".stripMargin,

    // Mirrors q99: same hash-family seed pick (smallest (uhash, vec_id)
    // LIMIT 8), same 0.0-seeded j-ascending squared-diff fold,
    // (dist, cid) argmin ≡ row_number ORDER BY dist, cid, and the
    // update step's integer-scaled sums with ONE double division —
    // CAST(sm)/(CAST(n)·1e6) in the identical IEEE order. dim emitted
    // 0-based (generate_subscripts is 1-based, hence the −1).
    "q99_kmeans_iter" -> {
      val uh = Q.uhashSql("9900", "(vec_id % 4294967291)")
      s"""WITH sd AS (SELECT vec_id AS cid, embedding AS se FROM embeddings
         |  ORDER BY $uh, vec_id LIMIT 8),
         |a AS (SELECT e.vec_id, e.embedding, s.cid,
         |    list_reduce(list_transform(range(1, len(e.embedding)+1), kmi ->
         |      (CAST(e.embedding[kmi] AS DOUBLE) - CAST(s.se[kmi] AS DOUBLE))
         |      * (CAST(e.embedding[kmi] AS DOUBLE) - CAST(s.se[kmi] AS DOUBLE))),
         |      (kmx, kmy) -> kmx + kmy) AS dist
         |  FROM embeddings e, sd s),
         |p AS (SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM a),
         |ex AS (SELECT cid, generate_subscripts(embedding, 1) AS dim1,
         |    unnest(embedding) AS x
         |  FROM p WHERE rn = 1)
         |SELECT CAST(cid AS BIGINT) AS cluster_id,
         |  CAST(dim1 - 1 AS BIGINT) AS dim,
         |  count(*) AS n,
         |  CAST(sum(CAST(round(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS BIGINT) AS sm,
         |  CAST(sum(CAST(round(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * 1e6) AS cent
         |FROM ex GROUP BY 1, 2 ORDER BY cluster_id, dim""".stripMargin
    },

    // Mirrors q141: the q99 assignment CTEs (same seed pick, same
    // squared-diff fold, argmin ≡ row_number dist,cid), then the
    // within-cluster lower-id pair count with the identical
    // dot/(sqrt·sqrt) IEEE tree as the Spark plan's cosine.
    "q141_semdedup" -> {
      val uh = Q.uhashSql("9900", "(vec_id % 4294967291)")
      s"""WITH sd AS (SELECT vec_id AS cid, embedding AS se FROM embeddings
         |  ORDER BY $uh, vec_id LIMIT 8),
         |a AS (SELECT e.vec_id, e.embedding, s.cid,
         |    list_reduce(list_transform(range(1, len(e.embedding)+1), kmi ->
         |      (CAST(e.embedding[kmi] AS DOUBLE) - CAST(s.se[kmi] AS DOUBLE))
         |      * (CAST(e.embedding[kmi] AS DOUBLE) - CAST(s.se[kmi] AS DOUBLE))),
         |      (kmx, kmy) -> kmx + kmy) AS dist
         |  FROM embeddings e, sd s),
         |p AS (SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM a),
         |m AS (SELECT vec_id, cid AS cluster_id, embedding,
         |    ${sqlDot("embedding", "embedding")} AS n2
         |  FROM p WHERE rn = 1),
         |d AS (SELECT x.vec_id, count(*) AS n_dups
         |  FROM m x JOIN m y ON x.cluster_id = y.cluster_id
         |    AND y.vec_id < x.vec_id
         |  WHERE ${sqlDot("x.embedding", "y.embedding")}
         |    / (sqrt(x.n2) * sqrt(y.n2)) > 0.3
         |  GROUP BY 1)
         |SELECT m.vec_id, CAST(m.cluster_id AS BIGINT) AS cluster_id,
         |  CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
         |  CAST(CASE WHEN coalesce(d.n_dups, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS keep
         |FROM m LEFT JOIN d ON m.vec_id = d.vec_id
         |ORDER BY m.vec_id""".stripMargin
    },

    // Mirrors q150: same hash family, per-label row_number over
    // (uhash, vec_id), scalar min class size.
    "q150_label_balance" -> {
      val uh = Q.uhashSql("15000", "(vec_id % 4294967291)")
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    $uh AS hk FROM embeddings),
         |mm AS (SELECT min(cnt) AS m FROM
         |  (SELECT count(*) AS cnt FROM e GROUP BY label)),
         |r AS (SELECT label, vec_id,
         |    row_number() OVER (PARTITION BY label ORDER BY hk, vec_id) AS rk
         |  FROM e)
         |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id
         |FROM r, mm WHERE rk <= mm.m ORDER BY label, rk""".stripMargin
    },

    // Mirrors q142: the q27 shape with the label inequality in the
    // pair predicate and rank cut at 5.
    "q142_hard_negatives" ->
      s"""WITH n AS (SELECT vec_id, label, embedding,
         |  ${sqlDot("embedding", "embedding")} AS n2
         |FROM embeddings),
         |q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qe, n2 AS qn2
         |  FROM n WHERE vec_id % 50 = 0),
         |p AS (SELECT qid, c.vec_id AS cid,
         |  ${sqlDot("qe", "c.embedding")} / (sqrt(qn2)*sqrt(c.n2)) AS cos
         |FROM q JOIN n c ON c.label <> qlabel),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM p)
         |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, round(cos, 6) AS cos_r
         |FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,
  )
}
