package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass VOC average precision as a typed
  * `Aggregator[IN, BUF, OUT]` — the §2.9 alternative to the window
  * plan (q15): one aggregation collects (score, label, tie) per
  * group, `finish` sorts desc-score once and computes
  * Σ Δrecall·precision_envelope exactly as
  * get_ava_active_speaker_performance.py:57–67.
  *
  * Determinism: `merge` concatenates partial buffers in arbitrary
  * order, but `finish` re-sorts on (score desc, tie asc) and sums
  * nano-scaled integer contributions, so the result is bit-identical
  * at any parallelism (same policy as q15's window plan).
  *
  * Scale: buffer is O(group size) — right for the many-small-groups
  * shape (per-entity AP); for one giant global group prefer the
  * window plan, which spills. */
case class ApIn(score: Long, label: Long, tie: Long)

object ApAggregator extends Aggregator[ApIn, List[ApIn], Double] {
  override def zero: List[ApIn] = Nil
  override def reduce(b: List[ApIn], a: ApIn): List[ApIn] = a :: b
  override def merge(b1: List[ApIn], b2: List[ApIn]): List[ApIn] = b1 ::: b2

  override def finish(buf: List[ApIn]): Double = {
    val rows = buf.toArray
    java.util.Arrays.sort(rows, (a: ApIn, b: ApIn) =>
      if (a.score != b.score) java.lang.Long.compare(b.score, a.score)
      else java.lang.Long.compare(a.tie, b.tie))
    val n = rows.length
    val pos = rows.count(_.label == 1L)
    if (n == 0 || pos == 0) return 0.0
    val prec = new Array[Double](n)
    val rec = new Array[Double](n)
    var tp = 0L
    var i = 0
    while (i < n) {
      tp += rows(i).label
      prec(i) = tp.toDouble / (i + 1)
      rec(i) = tp.toDouble / pos
      i += 1
    }
    // monotone precision envelope (suffix running max, :61–62)
    i = n - 2
    while (i >= 0) { if (prec(i + 1) > prec(i)) prec(i) = prec(i + 1); i -= 1 }
    // Σ Δrec · envelope, nano-scaled for order-independent exactness
    var acc = 0L
    i = 0
    while (i < n) {
      val dRec = rec(i) - (if (i == 0) 0.0 else rec(i - 1))
      acc += math.round(prec(i) * dRec * 1e9)
      i += 1
    }
    acc.toDouble / 1e9
  }

  override def bufferEncoder: Encoder[List[ApIn]] = Encoders.kryo[List[ApIn]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
