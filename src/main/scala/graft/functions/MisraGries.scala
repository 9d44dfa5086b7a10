package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed, MERGEABLE
  * `Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)]`
  * — the deterministic member of the frequency-sketch family next to
  * the probabilistic count-min (q205): k counters, no hash collisions,
  * no failure probability (Misra & Gries 1982, "Finding repeated
  * elements").
  *
  * Mergeability is the whole point at scale: Spark evaluates a typed
  * Aggregator as partial per-partition buffers combined pairwise in
  * arbitrary order, which is exactly the model of Agarwal et al. 2012
  * ("Mergeable summaries", PODS) — their Thm. 2.2 proves the merge
  * below (sum counters, then subtract the (k+1)-th largest count from
  * all and drop non-positives) keeps the MG guarantee over ANY merge
  * tree: every item with true frequency f keeps an estimate
  * ≥ f − N/(k+1). Hence any item with f > N/(k+1) SURVIVES in the
  * final summary, whatever the partitioning — the candidate set is a
  * superset of the true heavy hitters at any parallelism, even though
  * the summary's exact counter values are merge-order-dependent.
  *
  * The buffer's second component is the EXACT stream length N — the
  * sketch sees every item anyway, and N is trivially mergeable (sum),
  * so carrying it saves its consumer (q268) a whole extra corpus scan
  * for the `count()` the guarantee threshold needs (round-14 verdict
  * task 4). N is exact and merge-order-independent, unlike the
  * counters.
  *
  * q268 therefore never emits the (nondeterministic) counter values:
  * it emits the candidate SET's exact corpus counts from a second
  * bounded pass, filtered by the guarantee threshold — a
  * deterministic, oracle-checkable output whose equality with the
  * exact heavy hitters is the theorem above.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(buf: (Map[String, Long], Long), item: String): (Map[String, Long], Long) = {
    val (b, n) = buf
    val nb = b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all step: one unmatched arrival cancels one unit
        // of every tracked counter (k+1 distinct items pay together)
        b.iterator.collect { case (w, c) if c > 1L => (w, c - 1L) }.toMap
    }
    (nb, n + 1L)
  }

  override def merge(buf1: (Map[String, Long], Long), buf2: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val (b1, n1) = buf1
    val (b2, n2) = buf2
    val combined = b2.foldLeft(b1) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    val merged =
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest counter from all, drop <= 0
        // (Agarwal et al. 2012 §2: the merge that preserves the
        // N/(k+1) error bound under arbitrary merge trees)
        val kth = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.iterator.collect {
          case (w, c) if c - kth > 0L => (w, c - kth)
        }.toMap
      }
    (merged, n1 + n2)
  }

  /** Candidate items (sorted for stable downstream use) plus the exact
    * stream length. Counter values are merge-order-dependent and must
    * not leak into a deterministic query output; N is exact. */
  override def finish(buf: (Map[String, Long], Long)): (Seq[String], Long) =
    (buf._1.keysIterator.toSeq.sorted, buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]
  override def outputEncoder: Encoder[(Seq[String], Long)] =
    Encoders.kryo[(Seq[String], Long)]
}
