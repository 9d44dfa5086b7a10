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

  val queries = Map[String, Fn](

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
