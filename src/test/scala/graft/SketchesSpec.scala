package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries kernel invariants (the q155 correctness argument). */
class SketchesSpec extends AnyFunSuite {

  private def mg(xs: Seq[String], k: Int): Set[String] =
    Sketches.misraGries(xs.iterator, k).toSet

  test("superset guarantee: every item with count > n/(k+1) survives") {
    val rnd = new scala.util.Random(155)
    for (trial <- 1 to 20) {
      val k = 1 + rnd.nextInt(8)
      // Zipf-ish stream over a small alphabet so heavy items exist.
      val xs = Seq.fill(500 + rnd.nextInt(1500))(
        s"w${(math.sqrt(rnd.nextInt(400)).toInt)}")
      val n = xs.size
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.collect { case (w, c) if c * (k + 1) > n => w }.toSet
      val cand = mg(xs, k)
      assert(heavy.subsetOf(cand),
        s"trial $trial k=$k: missing ${heavy.diff(cand)}")
      assert(cand.size <= k, s"trial $trial: ${cand.size} > k=$k slots")
    }
  }

  test("survives adversarial decrement-heavy streams") {
    // k distinct singletons after each arrival of the heavy item: the
    // classic pattern that forces a decrement pass per arrival. The
    // heavy item's count is exactly n/(k+1) — ON the guarantee
    // boundary (the guarantee needs count STRICTLY above n/(k+1)),
    // so both outcomes (present or evicted) are legal; the kernel
    // just must not crash, overcount slots, or lose an above-line
    // item (the 'maj' majority stream checks that).
    val k = 4
    val xs = (1 to 100).flatMap(i => "hh" +: (1 to k).map(j => s"u$i-$j"))
    val cand = mg(xs, k)
    assert(cand.size <= k)
    val withMajority = xs ++ Seq.fill(xs.size)("maj")
    assert(mg(withMajority, k).contains("maj"))
  }

  test("degenerate cases: empty stream, k=1, uniform stream") {
    assert(mg(Seq.empty, 4).isEmpty)
    assert(mg(Seq("a", "a", "a", "b"), 1) == Set("a"))
    // Uniform stream: nothing above n/(k+1); any ≤ k survivors legal.
    assert(mg((1 to 100).map(i => s"x$i"), 5).size <= 5)
  }
}
