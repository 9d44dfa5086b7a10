package graft

import graft.nn.{DeterministicWeights, TalkNetBatchScorer, TalkNetModel}
import graft.operators.DurationEnsemble
import org.scalatest.funsuite.AnyFunSuite

/** The real TalkNet audio-visual forward (graft.nn.TalkNetModel):
  * frontend shapes (audio 100 Hz → 25 Hz ×128, visual T×512 → T×128),
  * score-per-frame contract, determinism, input sensitivity, and the
  * BatchScorer seat driven through the REAL DurationEnsemble loop
  * (demoTalkNet.py:253–269). Visual inputs are 112×112 — the
  * reference's center-crop size and the smallest the (4,4) avgpool
  * admits — with T=1 so a full forward stays affordable. */
class TalkNetSpec extends AnyFunSuite {

  private lazy val model = new TalkNetModel(DeterministicWeights())

  private def mfcc(t: Int, seed: Int = 0): Array[Array[Double]] =
    Array.tabulate(t, 13)((i, j) => ((i * 13 + j + seed) % 17 - 8).toDouble)

  private def frames(t: Int, seed: Int = 0): Array[Array[Double]] =
    Array.tabulate(t, 112 * 112)((i, p) => ((p * 31 + i * 7 + seed) % 256).toDouble)

  test("audioFrontend: T 100 Hz rows -> T/4 x 128 at 25 Hz") {
    val out = model.audioFrontend(mfcc(8))
    assert(out.shape.toSeq == Seq(2, 128))
    assert(out.data.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("score: one score per video frame, deterministic, input-sensitive") {
    val s1 = model.score(mfcc(4), frames(1), 112, 112)
    val s2 = model.score(mfcc(4), frames(1), 112, 112)
    val s3 = model.score(mfcc(4, seed = 5), frames(1), 112, 112)
    assert(s1.length == 1)
    assert(s1.toSeq == s2.toSeq, "forward is nondeterministic")
    assert(!s1(0).isNaN && !s1(0).isInfinite)
    assert(s1.toSeq != s3.toSeq, "score ignores the audio input")
  }

  test("score varies with the visual input too") {
    val s1 = model.score(mfcc(4), frames(1), 112, 112)
    val s2 = model.score(mfcc(4), frames(1, seed = 99), 112, 112)
    assert(s1.toSeq != s2.toSeq, "score ignores the visual input")
  }

  test("TalkNetBatchScorer drives the real DurationEnsemble loop") {
    val scorer = new TalkNetBatchScorer(DeterministicWeights(),
      mfcc(4), frames(1), 112, 112)
    val in = DurationEnsemble.EnsembleInput(1L, 2L, nAudioFrames = 4, nVideoFrames = 1)
    val out = DurationEnsemble.ensemble(in, scorer)
    assert(out.length == 1)
    // every duration slices the same (only) batch -> mean of 6 equal
    // forwards = the forward; the ensemble then numpy-rint(x, 1)s it
    val one = model.score(mfcc(4), frames(1), 112, 112)(0)
    assert(out(0) == Math.rint(one * 10) / 10)
  }
}
