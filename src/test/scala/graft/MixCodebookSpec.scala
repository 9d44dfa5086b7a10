package graft

/** Pins the two corpus-composition operators added in round 5 against
  * independent driver-side recomputation at sf0.001:
  *
  *  - q98_domain_mix: copies-per-doc formula (epoch weight base +
  *    deterministic hash coin) recomputed row-by-row in plain Scala.
  *  - q99_kmeans_iter: seed pick, argmin assignment and integer-scaled
  *    centroid sums recomputed by a brute-force O(n·k·d) loop.
  */
class MixCodebookSpec extends SparkSpec {

  test("q98 domain mix matches per-row recomputation") {
    val rows = SparkEntry.queries("q98_domain_mix")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val expected = docs.flatMap { case (id, src) =>
      val base = src match {
        case "src0" => 2L
        case "src1" | "src2" | "src3" | "src4" => 1L
        case _ => 0L
      }
      val frac = src match {
        case "src0" | "src1" => 500L
        case "src2" | "src3" | "src4" => 0L
        case _ => 300L
      }
      val coin = java.lang.Math.floorMod(id * 2654435761L + 40503L, 1000L)
      val n = base + (if (coin < frac) 1L else 0L)
      (0L until n).map(c => (id, src, c, n))
    }.sortBy(t => (t._1, t._3))

    assert(rows.toSeq == expected.toSeq)
    // both branches of the mix are actually exercised by the fixture:
    // at least one upsampled doc (src0 ⇒ ≥2 copies) and at least one
    // dropped doc (tail source with coin ≥ 300)
    assert(rows.exists(_._4 >= 2L), "no upsampled doc in fixture")
    assert(expected.map(_._1).distinct.length < docs.length, "no doc was dropped")
  }

  test("q99 kmeans iteration matches brute-force recomputation") {
    val out = SparkEntry.queries("q99_kmeans_iter")(spark, sf001)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val (ha, hb) = graft.operators.Dedup.affine(9900)
    val seeds = emb
      .map { case (id, v) =>
        (java.lang.Math.floorMod(ha * java.lang.Math.floorMod(id, 4294967291L) + hb,
          4294967291L), id, v)
      }
      .sortBy(t => (t._1, t._2)).take(8)
      .map(t => (t._2, t._3.map(_.toDouble)))

    val sums = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    emb.foreach { case (_, v) =>
      var bestC = Long.MaxValue; var bestD = Double.PositiveInfinity
      seeds.foreach { case (cid, se) =>
        var d = 0.0; var j = 0
        while (j < v.length) {
          val diff = v(j).toDouble - se(j); d += diff * diff; j += 1
        }
        if (d < bestD || (d == bestD && cid < bestC)) { bestD = d; bestC = cid }
      }
      var j = 0
      while (j < v.length) {
        // Spark/DuckDB round() is half-AWAY-FROM-ZERO; math.round is
        // floor(x+0.5) which differs on negative halves
        val q = BigDecimal(v(j).toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val (n0, s0) = sums.getOrElse((bestC, j.toLong), (0L, 0L))
        sums((bestC, j.toLong)) = (n0 + 1L, s0 + q)
        j += 1
      }
    }

    assert(out.keySet == sums.keySet.toSet)
    sums.foreach { case (k, (n, sm)) =>
      val (on, osm, ocent) = out(k)
      assert(on == n, s"count mismatch at $k")
      assert(osm == sm, s"scaled sum mismatch at $k")
      assert(ocent == sm.toDouble / (n.toDouble * 1e6), s"centroid mismatch at $k")
    }
  }
}
