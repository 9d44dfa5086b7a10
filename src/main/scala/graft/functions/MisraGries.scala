package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed, MERGEABLE
  * `Aggregator[String, Map[String, Long], Seq[String]]` — the
  * deterministic member of the frequency-sketch family next to the
  * probabilistic count-min (q205): k counters, no hash collisions,
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
  * q268 therefore never emits the (nondeterministic) counter values:
  * it emits the candidate SET's exact corpus counts from a second
  * bounded pass, filtered by the guarantee threshold — a
  * deterministic, oracle-checkable output whose equality with the
  * exact heavy hitters is the theorem above.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all step: one unmatched arrival cancels one unit
        // of every tracked counter (k+1 distinct items pay together)
        b.iterator.collect { case (w, c) if c > 1L => (w, c - 1L) }.toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
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
  }

  /** Candidate items only — counter values are merge-order-dependent
    * and must not leak into a deterministic query output. Sorted for
    * stable downstream use. */
  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    Encoders.kryo[Seq[String]]
}
