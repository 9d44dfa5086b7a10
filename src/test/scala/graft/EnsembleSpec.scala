package graft

import graft.operators.DurationEnsemble
import graft.operators.DurationEnsemble._

/** The batched duration-ensemble kernel (demoTalkNet.py:225–270):
  * batch slice geometry, feature truncation arithmetic, set-dedup of
  * the duration literal, and numpy-rint rounding. */
class EnsembleSpec extends SparkSpec {

  /** Records every scoreBatch call; returns zeros. */
  private class RecordingScorer extends BatchScorer {
    val calls = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Int, Int, Int)]()
    override def scoreBatch(in: EnsembleInput, duration: Int, batchIdx: Int,
        aLo: Int, aHi: Int, vLo: Int, vHi: Int): Array[Double] = {
      calls += ((duration, batchIdx, aLo, aHi, vLo, vHi))
      new Array[Double](vHi - vLo)
    }
  }

  test("duration literal dedupes like the Python set it is (:234)") {
    assert(DurationSet === Seq(1, 2, 3, 4, 5, 6))
  }

  test("batch slices follow i·d·100 / i·d·25 with end clipping (:257–262)") {
    val rec = new RecordingScorer
    // 160 video frames, exact 4× audio → length 6.4 s, no truncation
    ensemble(EnsembleInput(1, 0, 640, 160), rec)
    val byD = rec.calls.groupBy(_._1)
    // d=1: ceil(6.4)=7 batches; last covers v[150,160), a[600,640)
    assert(byD(1).map(c => (c._5, c._6)).toSeq ===
      (0 until 7).map(i => (i * 25, math.min((i + 1) * 25, 160))))
    assert(byD(1).last === ((1, 6, 600, 640, 150, 160)))
    // d=6: ceil(6.4/6)=2 batches: v[0,150)+v[150,160)
    assert(byD(6).map(c => (c._2, c._3, c._4, c._5, c._6)).toSeq ===
      Seq((0, 0, 600, 0, 150), (1, 600, 640, 150, 160)))
    // every duration covers every frame exactly once
    byD.values.foreach { calls =>
      assert(calls.map(c => c._6 - c._5).sum === 160)
    }
  }

  test("feature truncation: length = min((nA−nA%4)/100, nV/25) (:253–255)") {
    // nA = 397 → 396 usable → 3.96 s beats 100/25 = 4.0 s
    assert(truncatedLength(397, 100) === 3.96)
    assert(truncatedVideoFrames(397, 100) === 99) // last video frame dropped
    val rec = new RecordingScorer
    val out = ensemble(EnsembleInput(1, 0, 397, 100), rec)
    assert(out.length === 99)
    // audio clips to round(3.96·100) = 396 rows
    assert(rec.calls.map(_._4).max === 396)
    // video side: d=4 → ceil(3.96/4)=1 batch covering all 99 frames
    assert(rec.calls.filter(_._1 == 4).toSeq === Seq((4, 0, 0, 396, 0, 99)))
  }

  test("rounding is numpy rint(x·10)/10 — HALF_EVEN in double space (:269)") {
    val const = new BatchScorer {
      override def scoreBatch(in: EnsembleInput, duration: Int, batchIdx: Int,
          aLo: Int, aHi: Int, vLo: Int, vHi: Int): Array[Double] =
        Array.fill(vHi - vLo)(0.25)
    }
    val out = ensemble(EnsembleInput(1, 0, 100, 25), const)
    // mean = 0.25 exactly → rint(2.5) = 2 (even) → 0.2, not 0.3
    assert(out.forall(_ === 0.2))
  }

  test("HashBatchScorer ensemble matches the per-frame closed form (q65's oracle shape)") {
    val out = ensemble(EnsembleInput(42, 0, 4 * 130, 130), HashBatchScorer)
    assert(out.length === 130)
    val (a, b) = graft.operators.Dedup.affine(ScoreHashIdx)
    (0 until 130).foreach { f =>
      var s = 0.0
      DurationSet.foreach { d =>
        val i = f / (25 * d) // the batch containing f
        val h = (a * (42L * 1000000L + f) + b) % 4294967291L
        s += (h % 2000L - 1000L) / 1000.0 + (d - 3.5) * 0.01 + (i * 37 % 10) * 0.001
      }
      assert(out(f) === Math.rint(s / 6 * 10) / 10, s"frame $f")
    }
  }
}
