package graft

import graft.operators.Visual

/** The visual preprocessing kernels (demoTalkNet.py:244–248): OpenCV
  * fixed-point luminance, bilinear resize geometry, center-half crop
  * arithmetic, and the full chain at the q66 shape. */
class VisualSpec extends SparkSpec {

  test("grayFixedPoint is OpenCV's BGR2GRAY lut arithmetic") {
    assert(Visual.grayFixedPoint(255, 0, 0) === 29)   // pure blue ≈ 0.114·255
    assert(Visual.grayFixedPoint(0, 255, 0) === 150)  // pure green ≈ 0.587·255
    assert(Visual.grayFixedPoint(0, 0, 255) === 76)   // pure red ≈ 0.299·255
    assert(Visual.grayFixedPoint(255, 255, 255) === 255)
    assert(Visual.grayFixedPoint(0, 0, 0) === 0)
  }

  test("centerCropHalf hits the reference's [56,168) window at side 224") {
    val img = Array.tabulate(224 * 224)(i => (i / 224 * 1000 + i % 224).toDouble)
    val crop = Visual.centerCropHalf(img, 224)
    assert(crop.length === 112 * 112)
    assert(crop(0) === 56 * 1000 + 56.0)
    assert(crop.last === 167 * 1000 + 167.0)
  }

  test("bilinear resize: constant stays constant; 2× decimation is the 2×2 block average") {
    val const = Visual.resizeBilinear(Array.fill(16 * 16)(77.0), 16, 16, 224, 224)
    assert(const.forall(_ === 77.0))
    val rng = new scala.util.Random(13)
    val img = Array.fill(16 * 16)(rng.nextInt(256).toDouble)
    val half = Visual.resizeBilinear(img, 16, 16, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val blk = (img(2 * y * 16 + 2 * x) + img(2 * y * 16 + 2 * x + 1) +
        img((2 * y + 1) * 16 + 2 * x) + img((2 * y + 1) * 16 + 2 * x + 1)) / 4
      assert(half(y * 8 + x) === blk, s"($y,$x)") // exact, not approximate
    }
  }

  test("preprocess chain matches an independent per-pixel computation (q66 geometry)") {
    val payload = "The quick brown fox jumps over the lazy dog 0123456789".getBytes("UTF-8")
    val out = Visual.preprocess(payload, 16, 16, 8)
    assert(out.length === 16) // 8 → center [2,6) → 4×4
    def px(i: Int) = payload(i % payload.length) & 0xff
    def gray(y: Int, x: Int) = {
      val i = 3 * (y * 16 + x)
      ((px(i + 2) * 4899 + px(i + 1) * 9617 + px(i) * 1868 + 8192) >> 14).toDouble
    }
    for (cy <- 2 until 6; cx <- 2 until 6) {
      val expected = (gray(2 * cy, 2 * cx) + gray(2 * cy, 2 * cx + 1) +
        gray(2 * cy + 1, 2 * cx) + gray(2 * cy + 1, 2 * cx + 1)) / 4
      assert(out((cy - 2) * 4 + (cx - 2)) === expected)
    }
  }
}
