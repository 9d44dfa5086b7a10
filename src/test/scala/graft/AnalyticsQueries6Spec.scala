package graft

import graft.queries.AnalyticsQueries6
import org.apache.spark.sql.functions._

/** Semantics pins for q203/q204: the power iterate against a local
  * BigInt recompute from the raw parquet, and k-anonymity monotonicity
  * plus a direct risk recount. */
class AnalyticsQueries6Spec extends SparkSpec {

  test("q203 equals a local exact recompute from the raw embeddings") {
    val rows = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val d = 64
    // HALF_UP away from zero, matching Spark/DuckDB round() (plain
    // math.round would send -0.5 to 0 instead of -1)
    val q = rows.map(_.map(x => BigDecimal(x.toDouble * 1024)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt))
    val g = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d)
      g(i)(j) = q.iterator.map(r => r(i) * r(j)).sum
    def mul(v: Array[BigInt]) =
      Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
    val v2 = mul(mul(Array.fill(d)(BigInt(1))))
    val got = AnalyticsQueries6.queries("q203_power_iteration")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until d).foreach(i => assert(got(i.toLong) == v2(i).toString, s"dim $i"))
  }

  test("q205 CMS never underestimates and is exact when no bucket collides") {
    val got = AnalyticsQueries6.queries("q205_countmin")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20)
    assert(got.map(_._1).toSeq == (1L to 20L))
    got.foreach { case (_, tok, exact, est) =>
      assert(est >= exact, s"CMS underestimated '$tok': $est < $exact")
    }
    // ranks descend by exact count with token tie-break
    val ordered = got.sortBy(_._1).map(t => (-t._3, t._2)).toSeq
    assert(ordered == ordered.sorted)
  }

  test("q206 noise is bounded, deterministic, and n_released clamps at zero") {
    val a = AnalyticsQueries6.queries("q206_dp_release")(spark, sf001)
      .collect().map(_.toString).toSeq
    val b = AnalyticsQueries6.queries("q206_dp_release")(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(a == b, "noise must be deterministic per cell")
    AnalyticsQueries6.queries("q206_dp_release")(spark, sf001).collect().foreach { r =>
      val (nTrue, noise, rel) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(noise >= -16 && noise <= 16)
      assert(rel == math.max(nTrue + noise, 0L))
    }
    // the ladder actually draws from both tails on this corpus
    val noises = AnalyticsQueries6.queries("q206_dp_release")(spark, sf001)
      .collect().map(_.getLong(3))
    assert(noises.exists(_ < 0) && noises.exists(_ > 0))
  }

  test("q207 identical documents share their whole fingerprint set; disjoint ones none") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = graft.queries.Q.scratchDir(spark, "analytics6w")
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (31 to 60).map(i => s"w$i").mkString(" ")
    Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.AnalyticsQueries6.queries("q207_winnowing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1 && got(0)._1 == 1L && got(0)._2 == 2L)
    // shared count == the winnowed fingerprint set size of the text
    // (identical docs agree on every window minimum)
    assert(got(0)._3 >= 2 && got(0)._3 <= 26 - 4 + 1)
  }

  test("q208 halves partition the corpus and the drift gate is the integer cross-multiply") {
    val got = AnalyticsQueries6.queries("q208_drift_audit")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = spark.read.parquet(s"$sf001/events.parquet").count()
    assert(got.map(t => t._2 + t._3).sum == n, "every event lands in exactly one half")
    val (tf, ts) = (got.map(_._2).sum, got.map(_._3).sum)
    got.foreach { case (_, n1, n2, d) =>
      val expect = if (math.abs(n1 * ts - n2 * tf) * 200 > tf * ts) 1L else 0L
      assert(d == expect)
    }
  }

  test("q209 deciles tile the corpus and vocab_cum ends at the distinct token count") {
    import org.apache.spark.sql.functions._
    val got = AnalyticsQueries6.queries("q209_vocab_growth")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == (1L to 10L))
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(got.map(_._2).sum == nDocs)
    assert(got.last._4 == nDocs)
    val vocab = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .distinct().count()
    assert(got.map(_._3).sum == vocab && got.last._5 == vocab)
  }

  test("q210 canonical is the longest member and removals add up") {
    import org.apache.spark.sql.functions._
    val clusters = AnalyticsQueries6.queries("q210_canonical_pick")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(clusters.nonEmpty)
    val sizes = graft.queries.AnalyticsQueries5.queries("q200_fuzzy_clusters")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.foreach { case (comp, canon, removed, charsRemoved) =>
      assert(sizes(comp) == removed + 1, s"cluster $comp size mismatch")
      assert(charsRemoved >= 0)
      assert(canon >= comp, "canonical is a member (comp is the min id)")
    }
  }

  test("q204 risk counts are monotone in k and match a direct recount") {
    val got = AnalyticsQueries6.queries("q204_kanon_audit")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 5L, 10L, 20L))
    assert(got.map(_._4).distinct.length == 1, "n_groups_total constant")
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted, "groups_below monotone")
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted, "docs_at_risk monotone")
    val groups = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy(col("lang"), col("source"), expr("n_chars DIV 256"))
      .agg(count(lit(1)).as("cnt")).collect().map(_.getLong(3))
    got.foreach { case (k, below, risk, total) =>
      assert(below == groups.count(_ < k))
      assert(risk == groups.filter(_ < k).sum)
      assert(total == groups.length)
    }
  }
}
