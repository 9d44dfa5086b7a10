package graft

import graft.nn._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-JVM regression pins for the full network forwards under
  * DeterministicWeights — self-goldens (captured from this
  * implementation, not the reference — the semantics arguments live
  * in TensorSpec's hand goldens and the q132/q133/q134 DuckDB
  * oracles). Any unintended change to kernel indexing, layer order,
  * eps values or weight derivation shifts these in the 12th decimal
  * or sooner. */
class NnGoldenSpec extends AnyFunSuite {

  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("S3fdNetDetector golden detections (32x64, confTh 0.05)") {
    val det = new S3fdNetDetector(imh = 32, imw = 64, confTh = 0.05)
    val d = det.detect(3L, 7, 0.42)
    assert(d.length == 10)
    val (x1, y1, x2, y2, s) = d.head
    assert(close(x1, -94.259802553538) && close(y1, -94.567730401971) &&
      close(x2, 157.852109940903) && close(y2, 160.988989057913) &&
      close(s, 0.515436059158))
  }

  test("TalkNetModel golden score and audio embedding") {
    val model = new TalkNetModel(DeterministicWeights())
    val mfcc = Array.tabulate(4, 13)((i, j) => ((i * 13 + j) % 17 - 8).toDouble)
    val frames = Array.tabulate(1, 112 * 112)((i, p) => ((p * 31 + i * 7) % 256).toDouble)
    assert(close(model.score(mfcc, frames, 112, 112)(0), -0.966747690658))
    val af = model.audioFrontend(mfcc)
    assert(close(af.data(0), 0.012550750495))
    assert(close(af.data.sum, 6.358116138792))
  }
}
