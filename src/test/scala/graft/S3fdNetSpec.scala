package graft

import graft.nn.{DeterministicWeights, S3fdNet, S3fdNetDetector}
import org.scalatest.funsuite.AnyFunSuite

/** The real S3FD forward (graft.nn.S3fdNet) — architecture contract
  * against the PriorBox chain q112 oracles, preprocessing parity with
  * s3fd/__init__.py:42–48, and end-to-end determinism of the detector
  * seat. Runs at 32×32 / 45×80 so a full VGG16 forward stays cheap. */
class S3fdNetSpec extends AnyFunSuite {

  private lazy val net = new S3fdNet(DeterministicWeights())

  test("preprocess: channels are (B-123, G-117, R-104) like the reference's double flip") {
    // one pixel, R=200 G=150 B=50
    val t = S3fdNet.preprocess(Array(200, 150, 50), 1, 1)
    assert(t.shape.toSeq == Seq(3, 1, 1))
    assert(t.data(0) == 50.0 - 123.0)  // B - 123
    assert(t.data(1) == 150.0 - 117.0) // G - 117
    assert(t.data(2) == 200.0 - 104.0) // R - 104
  }

  test("forward: loc/conf counts equal the PriorBox prior count and maps match strides") {
    val img = Array.tabulate(32 * 32 * 3)(i => (i * 37) % 256)
    val (loc, conf, maps) = net.forward(S3fdNet.preprocess(img, 32, 32))
    // six sources at strides 4,8,16,32,64,128 of a 32×32 input
    assert(maps == Seq((8, 8), (4, 4), (2, 2), (1, 1), (1, 1), (1, 1)))
    val nPriors = maps.map { case (h, w) => h * w }.sum
    assert(loc.length == nPriors && conf.length == nPriors)
    assert(loc.forall(_.length == 4) && conf.forall(_.length == 2))
    val priors = graft.operators.S3fdPost.priors(32, 32, maps)
    assert(priors.length == nPriors)
  }

  test("forward is deterministic and input-sensitive") {
    val a = Array.tabulate(32 * 32 * 3)(i => (i * 37) % 256)
    val b = a.clone; b(0) = (b(0) + 128) % 256
    val (l1, c1, _) = net.forward(S3fdNet.preprocess(a, 32, 32))
    val (l2, _, _) = net.forward(S3fdNet.preprocess(a, 32, 32))
    val (l3, _, _) = net.forward(S3fdNet.preprocess(b, 32, 32))
    assert(l1.flatten.toSeq == l2.flatten.toSeq)
    assert(c1.flatten.forall(v => !v.isNaN && !v.isInfinite))
    assert(l1.flatten.toSeq != l3.flatten.toSeq, "forward ignores its input")
  }

  test("detectImage: boxes are in pixel bounds with score > confTh, deterministic") {
    val det = new S3fdNetDetector(imh = 45, imw = 80, confTh = 0.1)
    val d1 = det.detect(3L, 7, 0.42)
    val d2 = det.detect(3L, 7, 0.42)
    assert(d1 == d2, "detector seat is not deterministic")
    d1.foreach { case (x1, y1, x2, y2, s) =>
      assert(s > 0.1 && s <= 1.0)
      assert(x2 > x1 && y2 > y1)
      // decode can overshoot the frame; the tracker's geometry clamps —
      // but the center must be in-frame for a sane detection
      assert((x1 + x2) / 2 >= -80 && (x1 + x2) / 2 <= 160)
      assert((y1 + y2) / 2 >= -45 && (y1 + y2) / 2 <= 90)
    }
  }

  test("detector seat varies with frame content") {
    val det = new S3fdNetDetector(imh = 45, imw = 80, confTh = 0.0)
    val r1 = det.render(1L, 0, 0.1)
    val r2 = det.render(1L, 5, 0.9)
    assert(r1.toSeq != r2.toSeq, "render is frame-invariant")
  }
}
