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

  val queries = Map[String, Fn](
    // Brute-force cosine top-10 for every 50th vector (exact ANN
    // baseline; corpus-side scan, broadcast queries).
    "q27_cosine_topk" -> { (s, dir) =>
      val emb = withNorm(Tables.table(s, dir, "embeddings"))
      val qs = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("vd").as("qv"), col("n2").as("qn2"))
      val corpus = emb.select(col("vec_id").as("cid"), col("vd").as("cv"), col("n2").as("cn2"))
      corpus.join(broadcast(qs), col("cid") =!= col("qid"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (sqrt(col("qn2")) * sqrt(col("cn2"))))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("cid"), round(col("cos"), 6).as("cos_r"))
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
  )
}
