package graft.nn

/** The S3FD detection network forward — the seat that was stubbed
  * behind operators/S3fdPost until round 8 — re-implemented from the
  * architecture in model/faceDetector/s3fd/nets.py:28–174: the
  * VGG16-with-dilated-fc7 trunk, three L2Norm-scaled shallow sources,
  * two stride-2 extra sources, the 6 loc/conf conv heads, and the
  * head-0 max-out background trick (nets.py:144–145). Output is
  * exactly what S3fdPost.detectFrame consumes: per-prior loc n×4 and
  * conf-logit n×2 arrays, plus the feature-map sizes that PriorBox
  * derives its anchors from (nets.py:156–161).
  *
  * Parameter names follow the PyTorch state_dict ("vgg.0.weight", …)
  * so a checkpoint loader can fill a MapWeights 1:1; the default
  * DeterministicWeights store makes every executor materialize the
  * same pseudo-trained network with zero bytes shipped.
  *
  * Scale: one forward per frame inside a partition iterator — no
  * shuffle, no driver participation; cost is O(HW) per frame and the
  * net instance (weights included) is built once per partition via a
  * lazy val in the seat.
  */
final class S3fdNet(ws: WeightStore) extends Serializable {
  import Tensor._

  // (index, inCh, outCh, kernel, pad, dilation) of the vgg convs
  private val vggConvs: Map[Int, (Int, Int, Int, Int, Int)] = Seq(
    (0, 3, 64, 3, 1, 1), (2, 64, 64, 3, 1, 1),
    (5, 64, 128, 3, 1, 1), (7, 128, 128, 3, 1, 1),
    (10, 128, 256, 3, 1, 1), (12, 256, 256, 3, 1, 1), (14, 256, 256, 3, 1, 1),
    (17, 256, 512, 3, 1, 1), (19, 512, 512, 3, 1, 1), (21, 512, 512, 3, 1, 1),
    (24, 512, 512, 3, 1, 1), (26, 512, 512, 3, 1, 1), (28, 512, 512, 3, 1, 1),
    (31, 512, 1024, 3, 6, 6), (33, 1024, 1024, 1, 0, 1))
    .map { case (i, a, b, k, p, d) => i -> ((a, b, k, p, d)) }.toMap

  private def vggConv(idx: Int, x: Tensor): Tensor = {
    val (ic, oc, k, p, d) = vggConvs(idx)
    val w = ws.tensor(s"vgg.$idx.weight", oc, ic, k, k)
    val b = ws.vector(s"vgg.$idx.bias", oc)
    relu(conv2d(x, w, Some(b), padH = p, padW = p, dilH = d, dilW = d))
  }

  private def extra(idx: Int, ic: Int, oc: Int, k: Int, s: Int, p: Int, x: Tensor): Tensor = {
    val w = ws.tensor(s"extras.$idx.weight", oc, ic, k, k)
    val b = ws.vector(s"extras.$idx.bias", oc)
    relu(conv2d(x, w, Some(b), strideH = s, strideW = s, padH = p, padW = p))
  }

  private def head(kind: String, idx: Int, ic: Int, oc: Int, x: Tensor): Tensor = {
    val w = ws.tensor(s"$kind.$idx.weight", oc, ic, 3, 3)
    val b = ws.vector(s"$kind.$idx.bias", oc)
    conv2d(x, w, Some(b), padH = 1, padW = 1)
  }

  /** (loc n×4, conf n×2, featureMaps) for a 3×H×W input already in
    * the reference's preprocessed space (see S3fdNet.preprocess). */
  def forward(img: Tensor): (Array[Array[Double]], Array[Array[Double]], Seq[(Int, Int)]) = {
    var x = img
    // vgg[0..15] → conv3_3 source
    Seq(0, 2).foreach(i => x = vggConv(i, x)); x = maxPool2d(x, 2, 2, 2, 2)
    Seq(5, 7).foreach(i => x = vggConv(i, x)); x = maxPool2d(x, 2, 2, 2, 2)
    Seq(10, 12, 14).foreach(i => x = vggConv(i, x))
    val s1 = l2normScale(x, ws.vector("L2Norm3_3.weight", 256))
    // vgg[16..22] (ceil-mode pool, nets.py:53) → conv4_3 source
    x = maxPool2d(x, 2, 2, 2, 2, ceil = true)
    Seq(17, 19, 21).foreach(i => x = vggConv(i, x))
    val s2 = l2normScale(x, ws.vector("L2Norm4_3.weight", 512))
    // vgg[23..29] → conv5_3 source
    x = maxPool2d(x, 2, 2, 2, 2)
    Seq(24, 26, 28).foreach(i => x = vggConv(i, x))
    val s3 = l2normScale(x, ws.vector("L2Norm5_3.weight", 512))
    // vgg[30..34] → fc7 source
    x = maxPool2d(x, 2, 2, 2, 2)
    Seq(31, 33).foreach(i => x = vggConv(i, x))
    val s4 = x
    // extras → conv6_2, conv7_2 sources
    x = extra(0, 1024, 256, 1, 1, 0, x)
    x = extra(1, 256, 512, 3, 2, 1, x)
    val s5 = x
    x = extra(2, 512, 128, 1, 1, 0, x)
    x = extra(3, 128, 256, 3, 2, 1, x)
    val s6 = x

    val sources = Seq(s1, s2, s3, s4, s5, s6)
    val headIn = Seq(256, 512, 512, 1024, 512, 256)
    val locFlat = Array.newBuilder[Array[Double]]
    val confFlat = Array.newBuilder[Array[Double]]
    val maps = Seq.newBuilder[(Int, Int)]
    sources.zipWithIndex.foreach { case (s, i) =>
      val lo = head("loc", i, headIn(i), 4, s)
      val co0 = head("conf", i, headIn(i), if (i == 0) 4 else 2, s)
      val Array(_, h, w) = lo.shape
      maps += ((h, w))
      val hw = h * w
      var p = 0
      while (p < hw) {
        locFlat += Array.tabulate(4)(ch => lo.data(ch * hw + p))
        // head 0 max-out (nets.py:144–145): bg logit = max of ch 0..2
        val c0 =
          if (i == 0) math.max(co0.data(p), math.max(co0.data(hw + p), co0.data(2 * hw + p)))
          else co0.data(p)
        val c1 = if (i == 0) co0.data(3 * hw + p) else co0.data(hw + p)
        confFlat += Array(c0, c1)
        p += 1
      }
    }
    (locFlat.result(), confFlat.result(), maps.result())
  }
}

object S3fdNet {
  /** detect_faces input prep (s3fd/__init__.py:42–48) for an HWC RGB
    * uint8 buffer. The reference starts from cv2's BGR, flips to RGB,
    * subtracts img_mean=(104,117,123) in that flipped space (so
    * R−104, G−117, B−123), then flips back — the net therefore sees
    * channels (B−123, G−117, R−104) in that order. */
  def preprocess(rgb: Array[Int], h: Int, w: Int): Tensor = {
    // net channel c ← rgb channel src(c) − mean(c)
    val src = Array(2, 1, 0)               // B, G, R
    val means = Array(123.0, 117.0, 104.0)
    val data = new Array[Double](3 * h * w)
    var c = 0
    while (c < 3) {
      var p = 0
      while (p < h * w) {
        data(c * h * w + p) = (rgb(p * 3 + src(c)) & 0xff).toDouble - means(c)
        p += 1
      }
      c += 1
    }
    Tensor(Array(3, h, w), data)
  }

  /** Full detect_faces for one real image (pixel-space boxes after
    * confidence gate, NMS(0.3) and the second nms_(0.1) — the chain
    * S3fdPost implements and q112 oracles). */
  def detectImage(net: S3fdNet, rgb: Array[Int], h: Int, w: Int,
      confTh: Double = 0.8): Seq[(Double, Double, Double, Double, Double)] = {
    val (loc, conf, maps) = net.forward(preprocess(rgb, h, w))
    val pri = graft.operators.S3fdPost.priors(h, w, maps)
    graft.operators.S3fdPost.detectFrame(loc, conf, pri, w, h, confTh)
  }
}

/** BatchPipeline.FaceDetector running the REAL network forward on a
  * deterministic synthetic frame (the sandbox has no video corpus at
  * detector resolution; a deployment swaps `render` for a decoded
  * frame — everything downstream of the pixels is the real model).
  * `res` divides the reference's 640×360 working size by 2^k so the
  * specs can afford full forwards. */
final class S3fdNetDetector(ws: WeightStore = DeterministicWeights(),
    imh: Int = 45, imw: Int = 80, confTh: Double = 0.8)
    extends graft.pipeline.BatchPipeline.FaceDetector {
  @transient private lazy val net = new S3fdNet(ws)

  /** Deterministic frame: a bright axis-aligned block whose position
    * and size derive from (videoId, frame, content) — gives the
    * detector spatial structure that moves between frames. */
  private[graft] def render(videoId: Long, frame: Int, content: Double): Array[Int] = {
    val px = new Array[Int](imh * imw * 3)
    val cx = ((videoId * 37 + frame * 11) % imw.toLong).toInt
    val cy = ((videoId * 17 + frame * 7) % imh.toLong).toInt
    val r = 2 + (math.abs(content) * 7).toInt % math.max(1, math.min(imh, imw) / 4)
    var y = 0
    while (y < imh) {
      var x = 0
      while (x < imw) {
        val inside = math.abs(x - cx) <= r && math.abs(y - cy) <= r
        val base = if (inside) 200 else 30
        val p = (y * imw + x) * 3
        px(p) = base; px(p + 1) = (base * 3 / 4); px(p + 2) = base / 2
        x += 1
      }
      y += 1
    }
    px
  }

  override def detect(videoId: Long, frame: Int,
      content: Double): Seq[(Double, Double, Double, Double, Double)] =
    S3fdNet.detectImage(net, render(videoId, frame, content), imh, imw, confTh)
}
