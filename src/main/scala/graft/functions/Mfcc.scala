package graft.functions

/** Pure-JVM MFCC, numerically compatible with python_speech_features'
  * defaults as used by the reference (demoTalkNet.py:238;
  * dataLoader.py:41): 16 kHz, winlen 25 ms, winstep 10 ms, 13 cepstra,
  * 26 mel filters, NFFT 512, preemphasis 0.97, rectangular window,
  * ceplifter 22, appendEnergy — the audio front-end feature kernel
  * (SURVEY §2.9 "MFCC"). Runs inside mapPartitions media kernels; no
  * Spark types here.
  *
  * The fps-scaled win/step of dataLoader.py:40–46 (winlen·25/fps) is
  * exposed via the winLen/winStep parameters.
  */
object Mfcc {

  private val Eps = java.lang.Math.ulp(1.0) // numpy float64 eps ~2.22e-16

  def hz2mel(hz: Double): Double = 2595.0 * math.log10(1 + hz / 700.0)
  def mel2hz(mel: Double): Double = 700.0 * (math.pow(10, mel / 2595.0) - 1)

  /** In-place iterative radix-2 complex FFT (n power of two). */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) { // bit reversal
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** MFCC feature matrix: numFrames × numCep. */
  def mfcc(signal: Array[Double], sampleRate: Int = 16000,
      winLen: Double = 0.025, winStep: Double = 0.010, numCep: Int = 13,
      numFilt: Int = 26, nfft: Int = 512, preemph: Double = 0.97,
      cepLifter: Int = 22, appendEnergy: Boolean = true): Array[Array[Double]] = {

    // preemphasis
    val pre = new Array[Double](signal.length)
    if (signal.nonEmpty) pre(0) = signal(0)
    var i = 1
    while (i < signal.length) { pre(i) = signal(i) - preemph * signal(i - 1); i += 1 }

    // framing (zero-padded tail, as python_speech_features.framesig)
    val frameLen = math.round(winLen * sampleRate).toInt
    val frameStep = math.round(winStep * sampleRate).toInt
    val slen = pre.length
    val numFrames = if (slen <= frameLen) 1
      else 1 + math.ceil((slen - frameLen).toDouble / frameStep).toInt

    // mel filterbank bins
    val mels = Array.tabulate(numFilt + 2)(k =>
      hz2mel(0) + k * (hz2mel(sampleRate / 2.0) - hz2mel(0)) / (numFilt + 1))
    val bins = mels.map(m => math.floor((nfft + 1) * mel2hz(m) / sampleRate).toInt)

    // DCT-II orthogonal basis (numCep × numFilt)
    val dctBasis = Array.tabulate(numCep, numFilt) { (k, n) =>
      val c = 2.0 * math.cos(math.Pi * k * (2 * n + 1) / (2.0 * numFilt))
      c * (if (k == 0) math.sqrt(1.0 / (4 * numFilt)) else math.sqrt(1.0 / (2 * numFilt)))
    }
    val lift = Array.tabulate(numCep)(n => 1 + (cepLifter / 2.0) * math.sin(math.Pi * n / cepLifter))

    val out = Array.ofDim[Double](numFrames, numCep)
    val re = new Array[Double](nfft)
    val im = new Array[Double](nfft)
    val pspec = new Array[Double](nfft / 2 + 1)
    val fbankE = new Array[Double](numFilt)

    var f = 0
    while (f < numFrames) {
      java.util.Arrays.fill(re, 0.0); java.util.Arrays.fill(im, 0.0)
      val off = f * frameStep
      var k = 0
      while (k < frameLen) {
        val idx = off + k
        re(k) = if (idx < slen) pre(idx) else 0.0
        k += 1
      }
      fft(re, im)
      var e = 0.0
      k = 0
      while (k <= nfft / 2) {
        pspec(k) = (re(k) * re(k) + im(k) * im(k)) / nfft
        e += pspec(k)
        k += 1
      }
      if (e == 0.0) e = Eps
      var j = 0
      while (j < numFilt) {
        var s = 0.0
        var b = bins(j)
        while (b < bins(j + 1)) { s += (b - bins(j)).toDouble / (bins(j + 1) - bins(j)) * pspec(b); b += 1 }
        b = bins(j + 1)
        while (b < bins(j + 2)) { s += (bins(j + 2) - b).toDouble / (bins(j + 2) - bins(j + 1)) * pspec(b); b += 1 }
        fbankE(j) = math.log(if (s == 0.0) Eps else s)
        j += 1
      }
      var c = 0
      while (c < numCep) {
        var s = 0.0
        var n = 0
        while (n < numFilt) { s += fbankE(n) * dctBasis(c)(n); n += 1 }
        out(f)(c) = s * lift(c)
        c += 1
      }
      if (appendEnergy) out(f)(0) = math.log(e)
      f += 1
    }
    out
  }
}
