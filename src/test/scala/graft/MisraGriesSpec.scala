package graft

import graft.functions.MisraGries
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property q268's determinism rests on: the Misra–Gries
  * candidate set contains every item with true frequency > N/(k+1)
  * under ANY partitioning and ANY merge order (Agarwal et al. 2012,
  * Thm. 2.2) — so the exact-rescore output is the exact heavy-hitter
  * set at any parallelism, even though the summary's counter values
  * are merge-order-dependent. */
class MisraGriesSpec extends AnyFunSuite {

  private val mg = MisraGries(16)

  /** Reduce a stream chunk into a fresh buffer. */
  private def summarize(chunk: Seq[String]): (Map[String, Long], Long) =
    chunk.foldLeft(mg.zero)(mg.reduce)

  /** Zipf-ish deterministic stream: item i appears ~N/(i+1) times,
    * shuffled by a fixed LCG so arrivals interleave adversarially. */
  private def stream(n: Int, seed: Long): Vector[String] = {
    val raw = (0 until 40).flatMap(i => Seq.fill(n / (i + 1))(s"w$i")).toVector
    var s = seed
    val arr = raw.toArray
    var i = arr.length - 1
    while (i > 0) { // Fisher–Yates on the LCG (no RNG state in prod code; tests may)
      s = s * 6364136223846793005L + 1442695040888963407L
      val j = (java.lang.Long.remainderUnsigned(s >>> 16, i + 1)).toInt
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
    arr.toVector
  }

  test("candidate set ⊇ exact heavy hitters for every partitioning × merge tree") {
    for (seed <- 1L to 5L; parts <- Seq(1, 3, 8, 17)) {
      val data = stream(400, seed)
      val n = data.size.toLong
      val exact = data.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val heavy = exact.collect { case (w, c) if c * 17L > n => w }.toSet
      // chunk unevenly, summarize each, merge in two different orders
      val chunks = data.grouped(math.max(1, data.size / parts)).map(summarize).toList
      val leftFold = chunks.foldLeft(mg.zero)(mg.merge)
      val rightFold = chunks.reverse.foldLeft(mg.zero)((a, b) => mg.merge(b, a))
      for (buf <- Seq(leftFold, rightFold)) {
        val (candidateSeq, total) = mg.finish(buf)
        val candidates = candidateSeq.toSet
        assert(heavy.subsetOf(candidates),
          s"seed=$seed parts=$parts: missing ${heavy.diff(candidates)}")
        assert(candidates.size <= 16)
        // the carried stream length is EXACT under any merge order
        // (unlike the counters) — q268's threshold depends on it
        assert(total == n, s"seed=$seed parts=$parts: N carried $total != $n")
        // the estimate error bound itself: est ≥ f − N/(k+1)
        for ((w, est) <- buf._1; f = exact(w))
          assert(est >= f - n / 17L - 1 && est <= f)
      }
    }
  }

  test("q268 output equals a direct exact heavy-hitter computation at sf0.001") {
    val spark = SparkSpec.session
    val got = SparkEntry.queries("q268_misra_gries")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // pure-Scala exact recount of the corpus character stream
    val chars = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .flatMap(_.toCharArray.map(_.toString))
    val n = chars.length.toLong
    val want = chars.groupBy(identity).view.mapValues(_.length.toLong).toList
      .collect { case (c, cnt) if cnt * 17L > n => (c, cnt, cnt * 1000000L / n) }
      .sortBy(t => (-t._2, t._1))
    assert(got.nonEmpty, "sf0.001's letter skew should yield >N/17 heavy hitters")
    assert(got === want)
  }
}
