package graft.operators

/** S3FD's detection POST-PROCESSING as real math — the half of the
  * face detector that is pure arithmetic (the network forward itself
  * stays a pluggable seat; its weights aren't shipped in the
  * reference repo either, model/faceDetector/s3fd/__init__.py:9–13).
  *
  * Reproduced exactly from the reference:
  *  - anchor/prior generation (box_utils.py PriorBox.forward): per
  *    feature map k, centers ((j+0.5)·step_k/imw, (i+0.5)·step_k/imh),
  *    sizes (min_size_k/imw, min_size_k/imh), no clip;
  *  - SSD box decode (box_utils.py decode): center = prior center +
  *    loc·var0·prior size, size = prior size · exp(loc·var1), then
  *    corner form x1 = cx − w/2, x2 = x1 + w;
  *  - class softmax (nets.py:170 — the net applies Softmax(dim=-1)
  *    before Detect);
  *  - greedy NMS (box_utils.py nms): ascending score sort, keep the
  *    top nms_top_k, pop the max, suppress IoU > overlap, IoU =
  *    inter / ((rem − inter) + area_kept), areas WITHOUT the +1 the
  *    py_cpu variant also omits. Ties pop the larger index first
  *    (the argsort()[::-1] orientation of nms_);
  *  - Detect.forward (box_utils.py): conf > 0.05 mask → NMS(0.3,
  *    5000) → top 750 rows (score, box) in keep order;
  *  - detect_faces (__init__.py:32–62): scale boxes back to pixel
  *    coordinates, consume the score-descending prefix with
  *    score > conf_th, then the final `nms_(bboxes, 0.1)` pass over
  *    the pixel-scaled survivors (__init__.py:62).
  */
object S3fdPost {

  /** PriorBox.forward: flat (cx, cy, w, h) per prior, feature maps
    * ordered as given, row-major (i, j) within a map. */
  def priors(imh: Int, imw: Int, featureMaps: Seq[(Int, Int)],
      minSizes: Seq[Int] = Seq(16, 32, 64, 128, 256, 512),
      steps: Seq[Int] = Seq(4, 8, 16, 32, 64, 128)): Array[Array[Double]] = {
    val out = Array.newBuilder[Array[Double]]
    featureMaps.zipWithIndex.foreach { case ((feath, featw), k) =>
      val fkw = imw.toDouble / steps(k)
      val fkh = imh.toDouble / steps(k)
      var i = 0
      while (i < feath) {
        var j = 0
        while (j < featw) {
          out += Array((j + 0.5) / fkw, (i + 0.5) / fkh,
            minSizes(k).toDouble / imw, minSizes(k).toDouble / imh)
          j += 1
        }
        i += 1
      }
    }
    out.result()
  }

  /** Two-class softmax → P(face) = exp(c1) / (exp(c0) + exp(c1)),
    * computed max-shifted for stability (monotone-identical). */
  def softmaxFace(c0: Double, c1: Double): Double = {
    val m = math.max(c0, c1)
    val e0 = math.exp(c0 - m)
    val e1 = math.exp(c1 - m)
    e1 / (e0 + e1)
  }

  /** box_utils.decode for one prior: loc (lx, ly, lw, lh) against
    * prior (pcx, pcy, pw, ph), variances (v0, v1) — multiplication
    * order kept as the reference writes it (loc·var·prior). */
  def decode(loc: Array[Double], prior: Array[Double],
      v0: Double = 0.1, v1: Double = 0.2): Array[Double] = {
    val cx = prior(0) + loc(0) * v0 * prior(2)
    val cy = prior(1) + loc(1) * v0 * prior(3)
    val w = prior(2) * math.exp(loc(2) * v1)
    val h = prior(3) * math.exp(loc(3) * v1)
    val x1 = cx - w / 2
    val y1 = cy - h / 2
    Array(x1, y1, x1 + w, y1 + h)
  }

  /** Greedy NMS, torch-`nms` parity: consider only the `topK`
    * highest-scored boxes, repeatedly keep the max and drop
    * IoU > overlap. Returns kept indices in keep (score-descending)
    * order; ties pop the larger index first. */
  def nms(boxes: Array[Array[Double]], scores: Array[Double],
      overlap: Double = 0.3, topK: Int = 5000): Array[Int] = {
    val n = scores.length
    if (n == 0) return Array.empty
    val areas = boxes.map(b => (b(2) - b(0)) * (b(3) - b(1)))
    // ascending (score, idx) sort, then take the top `topK` from the
    // tail — idx ascending inside ties reproduces argsort()[::-1]'s
    // larger-index-first orientation when popped from the end
    var order = (0 until n).sortBy(i => (scores(i), i)).takeRight(topK).toArray
    val keep = Array.newBuilder[Int]
    while (order.nonEmpty) {
      val i = order.last
      keep += i
      order = order.dropRight(1).filter { j =>
        val xx1 = math.max(boxes(i)(0), boxes(j)(0))
        val yy1 = math.max(boxes(i)(1), boxes(j)(1))
        val xx2 = math.min(boxes(i)(2), boxes(j)(2))
        val yy2 = math.min(boxes(i)(3), boxes(j)(3))
        val inter = math.max(0.0, xx2 - xx1) * math.max(0.0, yy2 - yy1)
        val iou = inter / ((areas(j) - inter) + areas(i))
        iou <= overlap
      }
    }
    keep.result()
  }

  /** Detect.forward + the detect_faces tail for ONE frame: softmax'd
    * conf, conf_thresh (0.05) mask, NMS(nmsThresh, nmsTopK), top-k
    * cap, pixel scale-back by the ORIGINAL image dims, and the
    * score-descending `score > confTh` prefix. Returns
    * (x1, y1, x2, y2, score) rows in keep order. */
  def detectFrame(loc: Array[Array[Double]], conf: Array[Array[Double]],
      priorBoxes: Array[Array[Double]], imw: Int, imh: Int,
      confTh: Double = 0.8, confThresh: Double = 0.05,
      nmsThresh: Double = 0.3, nmsTopK: Int = 5000,
      topK: Int = 750): Seq[(Double, Double, Double, Double, Double)] = {
    require(loc.length == priorBoxes.length && conf.length == priorBoxes.length,
      s"S3fdPost.detectFrame: ${loc.length}/${conf.length} vs ${priorBoxes.length} priors")
    // conf mask then decode only the survivors (Detect.forward's
    // c_mask / l_mask) — at real prior counts (~25k for 640²) this
    // skips decode for the overwhelming background majority
    val idx = Array.newBuilder[Int]
    val sc = Array.newBuilder[Double]
    var p = 0
    while (p < priorBoxes.length) {
      val s = softmaxFace(conf(p)(0), conf(p)(1))
      if (s > confThresh) { idx += p; sc += s }
      p += 1
    }
    val ids = idx.result()
    val scores = sc.result()
    if (ids.isEmpty) return Seq.empty
    val boxes = ids.map(i => decode(loc(i), priorBoxes(i)))
    val keep = nms(boxes, scores, nmsThresh, nmsTopK).take(topK)
    // detect_faces: pt = detections · (w, h, w, h), consume while
    // score > conf_th (keep order IS score-descending) …
    val prefix = keep.iterator.map { k =>
      (boxes(k)(0) * imw, boxes(k)(1) * imh,
        boxes(k)(2) * imw, boxes(k)(3) * imh, scores(k))
    }.takeWhile(_._5 > confTh).toArray
    // … then the SECOND pass: nms_(bboxes, 0.1) over the pixel-scaled,
    // conf_th-filtered rows (__init__.py:62) — boxes that cleared
    // Detect.forward's NMS(0.3) but overlap in (0.1, 0.3] die here
    val pixBoxes = prefix.map(d => Array(d._1, d._2, d._3, d._4))
    nmsRef(pixBoxes, prefix.map(_._5), secondNms).map(prefix).toSeq
  }

  /** Default threshold of detect_faces' final `nms_(bboxes, 0.1)` pass. */
  val secondNms: Double = 0.1

  /** Greedy NMS, py_cpu `nms_` parity (box_utils.py:7–38): no top-k
    * cap, and IoU accumulated as `areas[i] + areas[j] − inter` (the
    * torch-nms pass associates it `(areas[j] − inter) + areas[i]`) —
    * kept bit-identical to each source. Tie orientation matches
    * argsort()[::-1]: larger index first. */
  def nmsRef(boxes: Array[Array[Double]], scores: Array[Double],
      thresh: Double): Array[Int] = {
    val n = scores.length
    if (n == 0) return Array.empty
    val areas = boxes.map(b => (b(2) - b(0)) * (b(3) - b(1)))
    var order = (0 until n).sortBy(i => (-scores(i), -i)).toArray
    val keep = Array.newBuilder[Int]
    while (order.nonEmpty) {
      val i = order.head
      keep += i
      order = order.tail.filter { j =>
        val xx1 = math.max(boxes(i)(0), boxes(j)(0))
        val yy1 = math.max(boxes(i)(1), boxes(j)(1))
        val xx2 = math.min(boxes(i)(2), boxes(j)(2))
        val yy2 = math.min(boxes(i)(3), boxes(j)(3))
        val inter = math.max(0.0, xx2 - xx1) * math.max(0.0, yy2 - yy1)
        val ovr = inter / (areas(i) + areas(j) - inter)
        ovr <= thresh
      }
    }
    keep.result()
  }

  /** The network-forward seat: per frame, (loc n×4, conf-logits n×2)
    * for `numPriors` priors. A real implementation runs S3FDNet here
    * (per-partition init via ModelWeights); the stub produces
    * deterministic logits. */
  trait LogitsSeat extends Serializable {
    def logits(videoId: Long, frame: Int, content: Double,
        numPriors: Int): (Array[Array[Double]], Array[Array[Double]])
  }

  /** FaceDetector backed by the REAL post-processing chain with a
    * pluggable network seat — drop-in for BatchPipeline.run. */
  final class S3fdDetector(seat: LogitsSeat, imh: Int = 360, imw: Int = 640,
      featureMaps: Seq[(Int, Int)] = Seq((90, 160), (45, 80), (23, 40), (12, 20), (6, 10), (3, 5)),
      minSizes: Seq[Int] = Seq(16, 32, 64, 128, 256, 512),
      steps: Seq[Int] = Seq(4, 8, 16, 32, 64, 128),
      confTh: Double = 0.8) extends graft.pipeline.BatchPipeline.FaceDetector {
    @transient private lazy val pri = priors(imh, imw, featureMaps, minSizes, steps)
    override def detect(videoId: Long, frame: Int,
        content: Double): Seq[(Double, Double, Double, Double, Double)] = {
      val (loc, conf) = seat.logits(videoId, frame, content, pri.length)
      detectFrame(loc, conf, pri, imw, imh, confTh)
    }
  }
}
