package graft.operators

/** REAL image codec on the JDK's pure-Java ImageIO plugins (PNG,
  * JPEG, BMP — headless, no native libraries), replacing the "no
  * codecs in this container" stub for image payloads. The reference
  * decodes frames with cv2.imread (demoTalkNet.py:115–120); here a
  * binary payload that carries a real image magic decodes through
  * ImageIO, and anything else falls back to the deterministic stub
  * raster — so fixtures and real media flow through ONE seat.
  *
  * PNG is lossless: encode(raster) → decode == raster byte-exact,
  * which is what lets q114 put the real codec under the DuckDB
  * oracle gate (the oracle recomputes features from the raster
  * formula; any codec pixel corruption breaks the hash).
  */
object ImageCodec {

  java.lang.System.setProperty("java.awt.headless", "true")

  // ImageIO's default stream cache is DISK-backed: every write/read
  // through createImageOutputStream spins up a FileCache temp FILE —
  // ~200 k temp files per q121/q129 run at sf0.1, and the dominant
  // cost of the tiny-frame codec roundtrips. Memory caching is
  // semantics-free (same bytes) and executor-safe (the buffers are
  // per-call).
  javax.imageio.ImageIO.setUseCache(false)

  def isPng(payload: Array[Byte]): Boolean =
    payload.length > 8 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'

  def isJpeg(payload: Array[Byte]): Boolean =
    payload.length > 3 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8

  /** "BM" is valid ASCII, so a bare magic check would misfire on text
    * payloads — require the header's little-endian file size to match
    * the payload too. */
  def isBmp(payload: Array[Byte]): Boolean =
    payload.length > 14 && payload(0) == 'B' && payload(1) == 'M' && {
      val sz = (payload(2) & 0xff) | ((payload(3) & 0xff) << 8) |
        ((payload(4) & 0xff) << 16) | ((payload(5) & 0xff).toLong << 24)
      sz == payload.length.toLong
    }

  def isImage(payload: Array[Byte]): Boolean =
    isPng(payload) || isJpeg(payload) || isBmp(payload)

  /** BGR raster [h·w·3] (ints 0..255, the Visual layout) → PNG. */
  def encodePng(px: Array[Int], h: Int, w: Int): Array[Byte] = {
    require(px.length == h * w * 3, s"raster ${px.length} != $h*$w*3")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var p = 0
    while (p < h * w) {
      val b = px(3 * p); val g = px(3 * p + 1); val r = px(3 * p + 2)
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** BGR raster → REAL JPEG (the cv2.imwrite/.jpg payload of
    * utils/tools.py:175 and the MJPG frames AviVideoEncoder muxes).
    * Lossy — roundtrips preserve dimensions exactly and pixels
    * approximately (ImageCodecSpec bounds the error), which is why
    * the oracle-gated roundtrips (q114/q121/q129) ride PNG and JPEG
    * serves the interchange/sink surface. */
  def encodeJpeg(px: Array[Int], h: Int, w: Int, quality: Float = 0.9f): Array[Byte] = {
    require(px.length == h * w * 3, s"raster ${px.length} != $h*$w*3")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var p = 0
    while (p < h * w) {
      val b = px(3 * p); val g = px(3 * p + 1); val r = px(3 * p + 2)
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** Decode any ImageIO-supported payload → (h, w, BGR raster). */
  def decodeBgr(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "ImageCodec.decodeBgr: undecodable payload")
    val h = img.getHeight; val w = img.getWidth
    val out = new Array[Int](h * w * 3)
    var p = 0
    while (p < h * w) {
      val rgb = img.getRGB(p % w, p / w)
      out(3 * p) = rgb & 0xff              // B
      out(3 * p + 1) = (rgb >> 8) & 0xff   // G
      out(3 * p + 2) = (rgb >> 16) & 0xff  // R
      p += 1
    }
    (h, w, out)
  }

  /** The unified decode seat: real ImageIO decode when the payload IS
    * an image (dims must match the declared raster shape — the
    * pipeline normalizes fps/size upstream, demoTalkNet.py:486–507),
    * the deterministic stub raster otherwise. */
  def decodeBgrAuto(payload: Array[Byte], h: Int, w: Int): Array[Int] =
    if (isImage(payload)) {
      val (dh, dw, px) = decodeBgr(payload)
      require(dh == h && dw == w,
        s"decodeBgrAuto: decoded ${dh}x$dw, declared ${h}x$w")
      px
    } else Visual.decodeBgrStub(payload, h, w)
}
