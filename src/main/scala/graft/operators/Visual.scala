package graft.operators

/** The visual preprocessing chain of the reference's scoring loop
  * (demoTalkNet.py:244–248): `cvtColor(BGR2GRAY)` → `resize(S,S)` →
  * center crop of half the side (`face[56:168, 56:168]` at S=224).
  *
  * Decode is a STUB (no codecs in this container) but the math after
  * it is real: the exact OpenCV fixed-point luminance, half-pixel-
  * center bilinear resize, and the reference's integer crop
  * arithmetic. One divergence, by contract: resize keeps DOUBLE
  * precision where cv2's uint8 path re-quantizes each stage — with a
  * stub decoder the geometry is the contract, not cv2 bit-parity.
  * At an exact 2× decimation the bilinear blend reduces to the 2×2
  * block average bit-exactly (all blends of 8-bit values are exact in
  * double), which is what makes q66's DuckDB oracle expressible.
  */
object Visual {

  /** OpenCV COLOR_BGR2GRAY fixed-point: (R·4899 + G·9617 + B·1868 +
    * 8192) >> 14 — the exact uint8 luminance cv2 computes. */
  def grayFixedPoint(b: Int, g: Int, r: Int): Int =
    (r * 4899 + g * 9617 + b * 1868 + 8192) >> 14

  /** STUB image decode: payload bytes cycle through an h×w×3 BGR
    * raster (deterministic; swap for the codec call at deploy time). */
  def decodeBgrStub(payload: Array[Byte], h: Int, w: Int): Array[Int] = {
    require(payload.nonEmpty, "decodeBgrStub: empty payload")
    val n = h * w * 3
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = payload(i % payload.length) & 0xff; i += 1 }
    out
  }

  /** BGR raster [h·w·3] → gray plane [h·w] (doubles). */
  def bgr2gray(px: Array[Int], h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    var p = 0
    while (p < h * w) {
      val i = p * 3
      out(p) = grayFixedPoint(px(i), px(i + 1), px(i + 2)).toDouble
      p += 1
    }
    out
  }

  /** Bilinear resize with half-pixel centers (src = (dst+0.5)·scale −
    * 0.5) and edge clamp — cv2 INTER_LINEAR geometry. */
  def resizeBilinear(img: Array[Double], h: Int, w: Int, oh: Int, ow: Int): Array[Double] = {
    val out = new Array[Double](oh * ow)
    val sy = h.toDouble / oh
    val sx = w.toDouble / ow
    var y = 0
    while (y < oh) {
      val fy0 = (y + 0.5) * sy - 0.5
      val yf = math.floor(fy0)
      val fy = fy0 - yf
      val y0 = math.min(math.max(yf.toInt, 0), h - 1)
      val y1 = math.min(y0 + 1, h - 1)
      var x = 0
      while (x < ow) {
        val fx0 = (x + 0.5) * sx - 0.5
        val xf = math.floor(fx0)
        val fx = fx0 - xf
        val x0 = math.min(math.max(xf.toInt, 0), w - 1)
        val x1 = math.min(x0 + 1, w - 1)
        val top = (1 - fx) * img(y0 * w + x0) + fx * img(y0 * w + x1)
        val bot = (1 - fx) * img(y1 * w + x0) + fx * img(y1 * w + x1)
        out(y * ow + x) = (1 - fy) * top + fy * bot
        x += 1
      }
      y += 1
    }
    out
  }

  /** `face[c−c/2 : c+c/2]` on both axes with c = side/2 — the
    * int(112 − 112/2) : int(112 + 112/2) arithmetic of :248
    * generalized (224 → rows/cols [56, 168)). */
  def centerCropHalf(img: Array[Double], side: Int): Array[Double] = {
    val c = side / 2
    val lo = c - c / 2
    val hi = c + c / 2
    val k = hi - lo
    val out = new Array[Double](k * k)
    var y = 0
    while (y < k) {
      var x = 0
      while (x < k) { out(y * k + x) = img((lo + y) * side + (lo + x)); x += 1 }
      y += 1
    }
    out
  }

  /** The full chain: decode h×w BGR → gray → resize S×S → center half
    * crop (returns (S/2)² values, row-major). Decode goes through the
    * unified seat (ImageCodec.decodeBgrAuto): REAL ImageIO decode for
    * image payloads, the stub raster for synthetic ones. */
  def preprocess(payload: Array[Byte], h: Int, w: Int, resizeTo: Int): Array[Double] =
    centerCropHalf(
      resizeBilinear(bgr2gray(ImageCodec.decodeBgrAuto(payload, h, w), h, w), h, w, resizeTo, resizeTo),
      resizeTo)
}
