package graft

import graft.operators.S3fdPost
import org.scalatest.funsuite.AnyFunSuite

/** S3FD post-processing: prior grid, SSD decode, torch-parity NMS,
  * and the Detect → detect_faces chain (box_utils.py / __init__.py). */
class S3fdPostSpec extends AnyFunSuite {

  test("priors: centers at (j+0.5)·step/imw, sizes min_size/im, row-major") {
    val p = S3fdPost.priors(8, 8, Seq((2, 2)), minSizes = Seq(16), steps = Seq(4))
    assert(p.length === 4)
    assert(p(0).toSeq === Seq(0.25, 0.25, 2.0, 2.0)) // i=0, j=0
    assert(p(1).toSeq === Seq(0.75, 0.25, 2.0, 2.0)) // i=0, j=1 (row-major)
    assert(p(2).toSeq === Seq(0.25, 0.75, 2.0, 2.0))
    assert(p(3).toSeq === Seq(0.75, 0.75, 2.0, 2.0))
    // multi-map: second map follows the first, its own step/size
    val p2 = S3fdPost.priors(8, 8, Seq((1, 1), (1, 1)),
      minSizes = Seq(16, 32), steps = Seq(4, 8))
    assert(p2.length === 2)
    assert(p2(1).toSeq === Seq(0.5, 0.5, 4.0, 4.0))
  }

  test("decode: center shift loc·v0·priorSize, size exp(loc·v1), corner form") {
    val prior = Array(0.5, 0.5, 0.2, 0.4)
    val b0 = S3fdPost.decode(Array(0.0, 0.0, 0.0, 0.0), prior)
    assert(b0(0) === 0.5 - 0.1 && b0(1) === 0.5 - 0.2)
    assert(b0(2) === (0.5 - 0.1) + 0.2 && b0(3) === (0.5 - 0.2) + 0.4)
    val b1 = S3fdPost.decode(Array(1.0, 0.0, 0.0, 0.0), prior)
    assert(b1(0) === (0.5 + 1.0 * 0.1 * 0.2) - 0.1)
    val b2 = S3fdPost.decode(Array(0.0, 0.0, 5.0, 0.0), prior)
    val w2 = 0.2 * math.exp(5.0 * 0.2)
    // x2 is built as x1 + w (not as an independent w), so compare the
    // same expression tree: x1 = cx − w/2, x2 = x1 + w
    assert(b2(0) === 0.5 - w2 / 2)
    assert(b2(2) === (0.5 - w2 / 2) + w2)
  }

  test("softmaxFace: symmetric point and monotonicity in the logit gap") {
    assert(S3fdPost.softmaxFace(0.0, 0.0) === 0.5)
    assert(S3fdPost.softmaxFace(0.0, 3.0) > S3fdPost.softmaxFace(0.0, 2.5))
    assert(S3fdPost.softmaxFace(0.0, -4.0) < 0.05) // the Detect conf gate
    assert(S3fdPost.softmaxFace(0.0, 2.0) > 0.8)   // the detect_faces gate
  }

  test("nms: keeps disjoint boxes, suppresses IoU > overlap, score order") {
    val a = Array(0.0, 0.0, 0.2, 0.2)
    val aShift = Array(0.01, 0.0, 0.21, 0.2) // IoU ≈ 0.9 vs a
    val far = Array(0.5, 0.5, 0.7, 0.7)
    val keep = S3fdPost.nms(Array(a, aShift, far), Array(0.9, 0.8, 0.85))
    assert(keep.toSeq === Seq(0, 2)) // aShift suppressed by a; far kept after
  }

  test("nms: le-overlap boundary keeps, topK drops low scores before the loop") {
    // IoU exactly 1/3 > 0.3 ⇒ suppressed; IoU = 0.25 ≤ 0.3 ⇒ kept
    val base = Array(0.0, 0.0, 1.0, 1.0)
    val half = Array(0.5, 0.0, 1.5, 1.0)   // inter 0.5, union 1.5 → 1/3
    val fifth = Array(0.6, 0.0, 1.6, 1.0)  // inter 0.4, union 1.6 → 0.25
    assert(S3fdPost.nms(Array(base, half), Array(0.9, 0.8)).toSeq === Seq(0))
    assert(S3fdPost.nms(Array(base, fifth), Array(0.9, 0.8)).toSeq === Seq(0, 1))
    // topK=1: only the single highest-scored box is ever considered
    val keep = S3fdPost.nms(Array(base, fifth), Array(0.8, 0.9), topK = 1)
    assert(keep.toSeq === Seq(1))
  }

  test("nms: equal scores pop the larger index first (argsort()[::-1] parity)") {
    val b1 = Array(0.0, 0.0, 0.1, 0.1)
    val b2 = Array(0.5, 0.5, 0.6, 0.6)
    assert(S3fdPost.nms(Array(b1, b2), Array(0.7, 0.7)).toSeq === Seq(1, 0))
  }

  test("nms matches an independent quadratic reference on seeded random boxes") {
    val rnd = new scala.util.Random(1234)
    val n = 120
    val boxes = Array.fill(n) {
      val x = rnd.nextDouble(); val y = rnd.nextDouble()
      Array(x, y, x + 0.05 + rnd.nextDouble() * 0.2, y + 0.05 + rnd.nextDouble() * 0.2)
    }
    // distinct scores ⇒ no tie ambiguity
    val scores = Array.tabulate(n)(i => (i * 7919 % n).toDouble / n)
    def iou(p: Array[Double], q: Array[Double]): Double = {
      val ix = math.max(0.0, math.min(p(2), q(2)) - math.max(p(0), q(0)))
      val iy = math.max(0.0, math.min(p(3), q(3)) - math.max(p(1), q(1)))
      val inter = ix * iy
      val ap = (p(2) - p(0)) * (p(3) - p(1)); val aq = (q(2) - q(0)) * (q(3) - q(1))
      inter / (ap + aq - inter)
    }
    // reference: repeatedly select the max-score live box, kill overlaps
    val live = Array.fill(n)(true)
    val expect = Seq.newBuilder[Int]
    var remaining = n
    while (remaining > 0) {
      val i = (0 until n).filter(live).maxBy(scores)
      expect += i
      live(i) = false; remaining -= 1
      (0 until n).filter(live).foreach { j =>
        if (iou(boxes(i), boxes(j)) > 0.3) { live(j) = false; remaining -= 1 }
      }
    }
    assert(S3fdPost.nms(boxes, scores).toSeq === expect.result())
  }

  test("detectFrame: conf gates, decode, NMS, pixel scale, score-prefix cut") {
    // 2×2 grid on a 64² image, 16-px anchors: four disjoint quadrant
    // boxes. Prior 0 p≈.95, prior 3 p≈.92 (detections), prior 1 p=0.5
    // (passes 0.05, fails the 0.8 prefix), prior 2 p≈.018 (masked out)
    val pri = S3fdPost.priors(64, 64, Seq((2, 2)), minSizes = Seq(16), steps = Seq(32))
    val loc = Array.fill(4)(Array(0.0, 0.0, 0.0, 0.0))
    val conf = Array(Array(0.0, 3.0), Array(0.0, 0.0), Array(0.0, -4.0), Array(0.0, 2.5))
    val dets = S3fdPost.detectFrame(loc, conf, pri, 64, 64)
    assert(dets.length === 2)
    assert(dets(0)._5 === S3fdPost.softmaxFace(0.0, 3.0))
    assert((dets(0)._1, dets(0)._2, dets(0)._3, dets(0)._4) === ((8.0, 8.0, 24.0, 24.0)))
    assert((dets(1)._1, dets(1)._2, dets(1)._3, dets(1)._4) === ((40.0, 40.0, 56.0, 56.0)))
  }

  test("detectFrame: second nms_(0.1) pass kills IoU in (0.1, 0.3]") {
    // two 16-px priors on a 1×2 map; shift prior 1 left so the decoded
    // boxes overlap at IoU = (a−d)/(a+d) = 0.2 — past Detect.forward's
    // NMS(0.3) gate, inside detect_faces' final nms_(0.1) kill zone
    val pri = S3fdPost.priors(64, 64, Seq((1, 2)), minSizes = Seq(16), steps = Seq(32))
    // prior 1: cx 0.75 → 0.25 + (2/3)·0.25; lx = Δcx / (v0 · pw)
    val lx = ((0.25 + 2.0 / 3 * 0.25) - 0.75) / (0.1 * 0.25)
    val loc = Array(Array(0.0, 0.0, 0.0, 0.0), Array(lx, 0.0, 0.0, 0.0))
    val conf = Array(Array(0.0, 3.0), Array(0.0, 2.5))
    val dets = S3fdPost.detectFrame(loc, conf, pri, 64, 64)
    assert(dets.length === 1) // survived NMS(0.3), suppressed by nms_(0.1)
    assert(dets.head._5 === S3fdPost.softmaxFace(0.0, 3.0))
    // control: at IoU exactly 0 both survive (the q112 oracle regime)
    val loc0 = Array.fill(2)(Array(0.0, 0.0, 0.0, 0.0))
    assert(S3fdPost.detectFrame(loc0, conf, pri, 64, 64).length === 2)
  }

  test("nmsRef: py_cpu nms_ parity — keep order, tie orientation, threshold edge") {
    val boxes = Array(
      Array(0.0, 0.0, 10.0, 10.0),   // 0: area 100
      Array(5.0, 0.0, 15.0, 10.0),   // 1: IoU with 0 = 50/150 ≈ 0.333
      Array(20.0, 0.0, 30.0, 10.0),  // 2: disjoint
      Array(0.0, 0.0, 10.0, 10.0))   // 3: duplicate of 0, same score
    val scores = Array(0.9, 0.8, 0.7, 0.9)
    // ties: argsort()[::-1] pops the LARGER index first → 3 before 0
    assert(S3fdPost.nmsRef(boxes, scores, 0.5).toSeq === Seq(3, 1, 2))
    // ovr <= thresh keeps (inclusive boundary): IoU(0,1) = 1/3
    assert(S3fdPost.nmsRef(boxes.take(3), scores.take(3), 1.0 / 3).toSeq === Seq(0, 1, 2))
    assert(S3fdPost.nmsRef(boxes.take(3), scores.take(3), 0.3).toSeq === Seq(0, 2))
    assert(S3fdPost.nmsRef(Array.empty, Array.empty, 0.1).toSeq === Seq.empty)
  }

  test("S3fdDetector plugs the chain into the FaceDetector seat") {
    val seat = new S3fdPost.LogitsSeat {
      def logits(videoId: Long, frame: Int, content: Double, n: Int) = {
        val loc = Array.fill(n)(Array(0.0, 0.0, 0.0, 0.0))
        val conf = Array.tabulate(n)(p =>
          if (p == frame % n) Array(0.0, 3.0) else Array(0.0, -6.0))
        (loc, conf)
      }
    }
    val det = new S3fdPost.S3fdDetector(seat, imh = 64, imw = 64,
      featureMaps = Seq((2, 2)), confTh = 0.8)
    val faces = det.detect(1L, 1, 0.0)
    assert(faces.length === 1)
    // prior 1 of the 4-px-step default sizes: min_size 16 at (j=1,i=0)
    assert(faces.head._5 === S3fdPost.softmaxFace(0.0, 3.0))
  }
}
