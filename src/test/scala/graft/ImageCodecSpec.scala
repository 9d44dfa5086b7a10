package graft

import graft.operators.{ImageCodec, SceneDetect, Visual}
import org.scalatest.funsuite.AnyFunSuite

/** The real ImageIO codec seat: lossless PNG roundtrip, magic
  * sniffing, and the unified decode dispatch. */
class ImageCodecSpec extends AnyFunSuite {

  test("PNG roundtrip is pixel-exact on a seeded random raster") {
    val rnd = new scala.util.Random(99)
    val raster = Array.fill(24 * 17 * 3)(rnd.nextInt(256))
    val png = ImageCodec.encodePng(raster, 24, 17)
    assert(ImageCodec.isPng(png) && !ImageCodec.isJpeg(png))
    val (h, w, back) = ImageCodec.decodeBgr(png)
    assert(h === 24 && w === 17)
    assert(back.toSeq === raster.toSeq)
  }

  test("decodeBgrAuto: image payloads decode for real, text falls back to the stub") {
    val raster = Array.tabulate(16 * 16 * 3)(k => (k * 7 + 3) % 256)
    val png = ImageCodec.encodePng(raster, 16, 16)
    assert(ImageCodec.decodeBgrAuto(png, 16, 16).toSeq === raster.toSeq)
    // declared dims must match a real image
    intercept[IllegalArgumentException](ImageCodec.decodeBgrAuto(png, 8, 8))
    // ASCII payload → the stub path, byte-for-byte
    val text = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    assert(ImageCodec.decodeBgrAuto(text, 4, 4).toSeq ===
      Visual.decodeBgrStub(text, 4, 4).toSeq)
  }

  test("a text payload starting with BM is NOT mistaken for a bitmap") {
    val text = "BM slope analysis for the quarterly report".getBytes("UTF-8")
    assert(!ImageCodec.isImage(text))
    assert(ImageCodec.decodeBgrAuto(text, 4, 4).toSeq ===
      Visual.decodeBgrStub(text, 4, 4).toSeq)
  }

  test("JPEG payloads decode through the same seat (lossy: dims + range only)") {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | ((x + y) * 8))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpg = out.toByteArray
    assert(ImageCodec.isJpeg(jpg))
    val px = ImageCodec.decodeBgrAuto(jpg, 16, 16)
    assert(px.length === 768 && px.forall(v => v >= 0 && v <= 255))
  }

  test("scene content over PNG payloads equals the same rasters as raw stub bytes") {
    // raw payload of exactly h·w·3 bytes stub-decodes to itself, so a
    // PNG of the same raster must produce identical channel deltas
    def raster(seed: Int) =
      Array.tabulate(2 * 2 * 3)(k => ((seed * 37 + k * 11) % 256))
    val frames = (0 until 6).map(f => (f, raster(f)))
    val rawRows = frames.map { case (f, r) => (f, r.map(_.toByte)) }.toArray
    val pngRows = frames.map { case (f, r) => (f, ImageCodec.encodePng(r, 2, 2)) }.toArray
    assert(SceneDetect.channelDeltas(pngRows, 2, 2).toSeq ===
      SceneDetect.channelDeltas(rawRows, 2, 2).toSeq)
  }
}
