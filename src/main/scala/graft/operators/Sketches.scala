package graft.operators

import scala.jdk.CollectionConverters._

/** Frequency-sketch kernels for the heavy-hitter surface (q155).
  *
  * Misra–Gries summary: k counters over a stream of n items, classic
  * decrement-all-on-overflow. Undercount error is at most n/(k+1), so
  * every item with true count > n/(k+1) is still present when the
  * stream ends — the candidate set is a guaranteed SUPERSET of the
  * heavy hitters, never a subset. That one-sided guarantee is what
  * lets q155 run sketch-per-partition + exact recount of the tiny
  * candidate set and still be bit-equal to the exact SQL answer:
  * if a global count c = Σ_p c_p exceeds n/K with K ≤ k+1, then some
  * partition has c_p > n_p/K ≥ n_p/(k+1) (pigeonhole), so the item
  * survives at least one partition's sketch. False positives are
  * killed by the recount; false negatives cannot exist.
  */
object Sketches {

  /** Misra–Gries over one partition's stream: returns the surviving
    * candidate items (counts are NOT meaningful — only membership is).
    * O(k) space, amortized O(1) per item (each decrement pass of cost
    * ≤ k is paid for by ≥ k prior arrivals). */
  def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    require(k > 0, s"need k > 0, got $k")
    val counts = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val x = it.next()
      val c = counts.get(x)
      if (c != 0L || counts.containsKey(x)) counts.put(x, c + 1)
      else if (counts.size < k) counts.put(x, 1L)
      else {
        val e = counts.entrySet().iterator()
        while (e.hasNext) {
          val ent = e.next()
          if (ent.getValue == 1L) e.remove() else ent.setValue(ent.getValue - 1)
        }
      }
    }
    // Copy before the map goes out of scope (iterator laziness).
    counts.keySet().asScala.toVector.iterator
  }
}
