package graft

import org.apache.spark.sql.functions._

/** Structural properties of the round-17 selection/layout pack
  * (AnalyticsQueries10) that the row-hash oracle can't see:
  * q267's resampling bias actually points AT the target domain,
  * q269's TV matrix is a bounded metric consistent with an
  * independently-derived full-outer formulation, and q270's packing
  * arithmetic conserves tokens and bounds waste by construction. */
class SelectionPackSpec extends SparkSpec {

  // the uhash mirror of Q.uhashSql / Dedup.affine, for re-derivations
  private def uhash(i: Long, x: Long): Long = {
    def pm(v: Long, p: Long) = { val m = v % p; if (m < 0) m + p else m }
    val a = pm(i * 2654435761L, 1L << 30) * 2 + 1
    val b = pm(i * 40503L + 778797L, 1L << 30)
    pm(a * pm(x, 4294967291L) + b, 4294967291L)
  }

  // NOTE: the synthetic corpus draws every lang's text from ONE flat
  // word distribution, so there is no domain signal for DSIR to find
  // here — "en is sampled at a higher rate" is NOT a property of this
  // data (measured: ~554k vs ~560k ppm, statistically flat). What IS
  // pinned is the mechanism itself: the whole pipeline (hashed-bucket
  // model → integer-rational scores → hash-threshold resample)
  // re-derived in pure Scala must reproduce the query bit-for-bit.
  test("q267: output equals a pure-Scala re-derivation of the DSIR pipeline") {
    val got = SparkEntry.queries("q267_dsir_resample")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.sources.Tables.table(spark, sf001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, lang, text) =>
      text.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (id, lang, uhash(26700L, graft.operators.Dedup.polyHash(w)) % 128L))
    }
    val rB = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val tB = toks.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val rt = toks.length.toLong
    val tt = toks.count(_._2 == "en").toLong
    def score(b: Long): Long =
      (((tB.getOrElse(b, 0L) + 1) * 1000000L / (tt + 128)) + 1) * 1000L /
        (((rB(b) + 1) * 1000000L / (rt + 128)) + 1)
    val perDoc = toks.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => (ts.map(t => score(t._3)).sum, ts.length.toLong)).toMap
    val mx = perDoc.values.map(_._1).max
    val want = perDoc.toList.groupBy(_._1._2).view.mapValues { ds =>
      val kept = ds.filter { case ((id, _), (sc, _)) =>
        uhash(26701L, id) % 1000000L < sc * 1000000L / mx }
      (ds.size.toLong, kept.size.toLong, kept.map(_._2._2).sum)
    }.toMap
    assert(got === want)
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._2).sum <
      got.values.map(_._1).sum) // resampling actually drops and keeps
  }

  test("q269: TV is a bounded semimetric and matches a full-outer re-derivation") {
    val got = SparkEntry.queries("q269_tv_drift")(spark, sf001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((a, b), tv) =>
      assert(a < b); assert(tv >= 0L && tv <= 1000000L)
    }
    // independent formulation: full outer join on word, missing → 0
    val wc = graft.sources.Tables.table(spark, sf001, "documents")
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = wc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val langs = totals.keys.toList.sorted
    for (a <- langs; b <- langs if a < b) {
      val vocab = wc.keysIterator.map(_._2).toSet
      val (na, nb) = (totals(a), totals(b))
      val numer = vocab.iterator.map { w =>
        (BigInt(wc.getOrElse((a, w), 0L)) * nb - BigInt(wc.getOrElse((b, w), 0L)) * na).abs
      }.sum
      val want = (numer * 1000000 / (BigInt(2) * na * nb)).toLong
      assert(got((a, b)) === want, s"pair ($a,$b)")
    }
  }

  test("q271: the peel curve is monotone and stabilizes exactly on the 3-core") {
    val rows = SparkEntry.queries("q271_kcore")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(rows.map(_._1) === List(0L, 1L, 2L, 3L, 4L)) // the 5 peel rounds
    // peeling only removes: n_alive and key_sum are non-increasing
    rows.sliding(2).foreach { case List(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"round ${b._1} grew")
    }
    // once a round removes nothing, the set is an invariant of the
    // peel map — every later round must be identical (fixpoint)
    val firstFix = rows.sliding(2).indexWhere { case List(a, b) => a._2 == b._2 && a._3 == b._3 }
    if (firstFix >= 0) rows.drop(firstFix + 1).foreach { r =>
      assert((r._2, r._3) === (rows(firstFix)._2, rows(firstFix)._3))
    }
  }

  test("q272: positions are contiguous and the head block round-robins the languages") {
    val df = SparkEntry.queries("q272_curriculum_interleave")(spark, sf001)
    // the r <= 40 filter must plan as WindowGroupLimit (map-side
    // per-partition top-40 per lang) — without it a 100 TB language
    // pays a full per-lang sort for a 40-row answer
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "q272's rank window lost its WindowGroupLimit rewrite")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toList
    assert(rows.map(_._1) === (1L to 40L).toList)
    val langs = rows.map(_._2).distinct.size
    // rank-major order: the first |langs| positions are the rank-1
    // docs of |langs| distinct languages (every lang has ≥1 doc here)
    val head = rows.take(langs)
    assert(head.map(_._2).distinct.size === langs)
    assert(head.forall(_._3 == 1L))
    // ranks never decrease along the curriculum
    rows.sliding(2).foreach { case List(a, b) => assert(b._3 >= a._3) }
  }

  test("q273: the bucket-pruned skyline equals the naive dominance definition") {
    val got = SparkEntry.queries("q273_pareto_frontier")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val pts = graft.sources.Tables.events(spark, sf001)
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("x"),
        org.apache.spark.sql.functions.sum(graft.queries.Q.cents(
          org.apache.spark.sql.functions.col("value"))).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val want = pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, qx, qy) => qx >= x && qy >= y && (qx > x || qy > y) }
    }.sortBy(t => (-t._2, -t._3, t._1))
    assert(got.nonEmpty && got === want)
    // frontier is an antichain: along x-descending order, y must rise
    // strictly at every x step (equal x on a skyline forces equal y —
    // the mutually-undominated duplicate case)
    got.sliding(2).foreach { case List(a, b) =>
      assert(b._2 <= a._2)
      if (b._2 < a._2) assert(b._3 > a._3) else assert(b._3 == a._3)
    }
  }

  test("q270: chunk arithmetic conserves tokens and bounds waste by the shard count") {
    val rows = SparkEntry.queries("q270_context_pack")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, chunks, split, waste) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(chunks * 256L >= total, "chunks must cover every token")
      // each of the ≤8 shards wastes < 256 tokens (only its ragged last chunk)
      assert(chunks * 256L - total < 8L * 256L, "waste exceeds one ragged chunk per shard")
      assert(split <= nDocs && split >= 0)
      assert(waste === (chunks * 256L - total) * 1000000L / (chunks * 256L))
      // a doc splits only if some shard holds ≥ 2 chunks' worth
      if (split > 0) assert(chunks > 8L || total > 256L)
    }
  }
}
