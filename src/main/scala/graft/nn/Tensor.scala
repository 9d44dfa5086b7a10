package graft.nn

/** Minimal dense row-major tensor + the inference kernels the
  * reference's networks are built from (model/faceDetector/s3fd/
  * nets.py:28–174, model/audioEncoder.py:54–108,
  * model/visualEncoder.py:100–172, model/attentionLayer.py:8–36).
  *
  * Pure-JVM double math with DEFINED accumulation order (input
  * channel ascending, then kernel row, then kernel col) — every
  * forward is bit-deterministic across runs, partitions and
  * executors, and EXACT (order-independent integer arithmetic) when
  * weights and inputs are integer-valued, which is what lets q132
  * oracle the conv/pool/linear kernels against relational SQL.
  *
  * Layouts follow PyTorch: conv2d input C×H×W, weight O×(C/g)×KH×KW;
  * conv1d C×L, O×(C/g)×K; conv3d C×D×H×W. No batch dim — callers
  * loop samples (the batch loop lives in Spark's partition iterator,
  * which is where the parallelism belongs on a cluster).
  */
final class Tensor(val shape: Array[Int], val data: Array[Double]) extends Serializable {
  require(shape.product == data.length,
    s"shape ${shape.mkString("x")} != data ${data.length}")
  def dim(i: Int): Int = shape(i)
  def rank: Int = shape.length
  def size: Int = data.length
  def reshape(ns: Int*): Tensor = Tensor(ns.toArray, data)
  def map(f: Double => Double): Tensor = Tensor(shape, data.map(f))
  override def toString: String = s"Tensor(${shape.mkString("x")})"
}

object Tensor {
  def apply(shape: Array[Int], data: Array[Double]): Tensor = new Tensor(shape, data)
  def zeros(shape: Int*): Tensor = new Tensor(shape.toArray, new Array[Double](shape.product))

  // ---------------------------------------------------------------- conv

  /** Output length of one conv/pool axis. */
  def outLen(in: Int, k: Int, stride: Int, pad: Int, dil: Int = 1,
      ceil: Boolean = false): Int = {
    val span = in + 2 * pad - dil * (k - 1) - 1
    if (ceil) (span + stride - 1) / stride + 1 else span / stride + 1
  }

  /** nn.Conv2d inference (zero padding, dilation, groups). */
  def conv2d(x: Tensor, w: Tensor, bias: Option[Array[Double]],
      strideH: Int = 1, strideW: Int = 1, padH: Int = 0, padW: Int = 0,
      dilH: Int = 1, dilW: Int = 1, groups: Int = 1): Tensor = {
    val Array(c, h, wd) = x.shape
    val Array(o, cg, kh, kw) = w.shape
    require(c == cg * groups, s"conv2d: in-ch $c != ${cg}x$groups")
    require(o % groups == 0, "conv2d: out-ch not divisible by groups")
    val oh = outLen(h, kh, strideH, padH, dilH)
    val ow = outLen(wd, kw, strideW, padW, dilW)
    val out = new Array[Double](o * oh * ow)
    val og = o / groups
    // hoisted backing arrays: the JIT keeps these in registers, where
    // the per-element `x.data(...)` field loads did not (measured ~2×
    // on the q242 visual stem)
    val xd = x.data
    val kd = w.data
    var oc = 0
    while (oc < o) {
      val g = oc / og
      val b = bias.map(_(oc)).getOrElse(0.0)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var acc = b
          var ic = 0
          while (ic < cg) {
            val xc = g * cg + ic
            var ky = 0
            while (ky < kh) {
              val iy = oy * strideH - padH + ky * dilH
              if (iy >= 0 && iy < h) {
                val xRow = (xc * h + iy) * wd
                val kRow = ((oc * cg + ic) * kh + ky) * kw
                var kx = 0
                while (kx < kw) {
                  val ix = ox * strideW - padW + kx * dilW
                  if (ix >= 0 && ix < wd)
                    acc += xd(xRow + ix) * kd(kRow + kx)
                  kx += 1
                }
              }
              ky += 1
            }
            ic += 1
          }
          out((oc * oh + oy) * ow + ox) = acc
          ox += 1
        }
        oy += 1
      }
      oc += 1
    }
    Tensor(Array(o, oh, ow), out)
  }

  /** nn.Conv1d inference (groups covers the depthwise DSConv1d). */
  def conv1d(x: Tensor, w: Tensor, bias: Option[Array[Double]],
      stride: Int = 1, pad: Int = 0, dil: Int = 1, groups: Int = 1): Tensor = {
    val x2 = Tensor(Array(x.shape(0), 1, x.shape(1)), x.data)
    val w2 = Tensor(Array(w.shape(0), w.shape(1), 1, w.shape(2)), w.data)
    val y = conv2d(x2, w2, bias, strideH = 1, strideW = stride,
      padH = 0, padW = pad, dilH = 1, dilW = dil, groups = groups)
    Tensor(Array(y.shape(0), y.shape(2)), y.data)
  }

  /** nn.Conv3d inference (the visualFrontend's (5,7,7) stem). */
  def conv3d(x: Tensor, w: Tensor, bias: Option[Array[Double]],
      strideD: Int, strideH: Int, strideW: Int,
      padD: Int, padH: Int, padW: Int): Tensor = {
    val Array(c, d, h, wd) = x.shape
    val Array(o, cg, kd, kh, kw) = w.shape
    require(c == cg, "conv3d: groups unsupported")
    val od = outLen(d, kd, strideD, padD)
    val oh = outLen(h, kh, strideH, padH)
    val ow = outLen(wd, kw, strideW, padW)
    val out = new Array[Double](o * od * oh * ow)
    val xd = x.data // hoisted — see conv2d
    val kwd = w.data
    var oc = 0
    while (oc < o) {
      val b = bias.map(_(oc)).getOrElse(0.0)
      var oz = 0
      while (oz < od) {
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var acc = b
            var ic = 0
            while (ic < c) {
              var kz = 0
              while (kz < kd) {
                val iz = oz * strideD - padD + kz
                if (iz >= 0 && iz < d) {
                  var ky = 0
                  while (ky < kh) {
                    val iy = oy * strideH - padH + ky
                    if (iy >= 0 && iy < h) {
                      val xRow = ((ic * d + iz) * h + iy) * wd
                      val kRow = (((oc * c + ic) * kd + kz) * kh + ky) * kw
                      var kx = 0
                      while (kx < kw) {
                        val ix = ox * strideW - padW + kx
                        if (ix >= 0 && ix < wd)
                          acc += xd(xRow + ix) * kwd(kRow + kx)
                        kx += 1
                      }
                    }
                    ky += 1
                  }
                }
                kz += 1
              }
              ic += 1
            }
            out(((oc * od + oz) * oh + oy) * ow + ox) = acc
            ox += 1
          }
          oy += 1
        }
        oz += 1
      }
      oc += 1
    }
    Tensor(Array(o, od, oh, ow), out)
  }

  // ---------------------------------------------------------------- dense

  /** nn.Linear: x N×F · wᵀ (w is O×F) + b → N×O. */
  def linear(x: Tensor, w: Tensor, bias: Option[Array[Double]]): Tensor = {
    val Array(n, f) = x.shape
    val Array(o, f2) = w.shape
    require(f == f2, s"linear: $f != $f2")
    val out = new Array[Double](n * o)
    val xd = x.data // hoisted — see conv2d
    val wd = w.data
    var r = 0
    while (r < n) {
      var c = 0
      while (c < o) {
        var acc = bias.map(_(c)).getOrElse(0.0)
        val xRow = r * f
        val wRow = c * f
        var k = 0
        while (k < f) { acc += xd(xRow + k) * wd(wRow + k); k += 1 }
        out(r * o + c) = acc
        c += 1
      }
      r += 1
    }
    Tensor(Array(n, o), out)
  }

  // ---------------------------------------------------------------- norms

  /** BatchNorm inference over channel = dim 0 of a C×… tensor:
    * γ·(x−μ)/√(σ²+ε)+β with running stats. */
  def batchNorm(x: Tensor, gamma: Array[Double], beta: Array[Double],
      mean: Array[Double], variance: Array[Double], eps: Double = 1e-5): Tensor = {
    val c = x.shape(0)
    val inner = x.size / c
    val out = new Array[Double](x.size)
    var ch = 0
    while (ch < c) {
      val scale = gamma(ch) / math.sqrt(variance(ch) + eps)
      val shift = beta(ch) - mean(ch) * scale
      var i = 0
      while (i < inner) { out(ch * inner + i) = x.data(ch * inner + i) * scale + shift; i += 1 }
      ch += 1
    }
    Tensor(x.shape, out)
  }

  /** S3FD L2Norm (nets.py:8–25): per-pixel channel-L2 normalize then
    * scale by the per-channel learned gamma; norm = √(Σ x²) + eps. */
  def l2normScale(x: Tensor, weight: Array[Double], eps: Double = 1e-10): Tensor = {
    val Array(c, h, w) = x.shape
    val out = new Array[Double](x.size)
    val hw = h * w
    var p = 0
    while (p < hw) {
      var ss = 0.0
      var ch = 0
      while (ch < c) { val v = x.data(ch * hw + p); ss += v * v; ch += 1 }
      val inv = 1.0 / (math.sqrt(ss) + eps)
      ch = 0
      while (ch < c) {
        out(ch * hw + p) = x.data(ch * hw + p) * inv * weight(ch)
        ch += 1
      }
      p += 1
    }
    Tensor(x.shape, out)
  }

  /** nn.LayerNorm over the LAST dim of an N×F tensor (biased var). */
  def layerNorm(x: Tensor, gamma: Array[Double], beta: Array[Double],
      eps: Double = 1e-5): Tensor = {
    val Array(n, f) = x.shape
    val out = new Array[Double](x.size)
    var r = 0
    while (r < n) {
      var s = 0.0
      var k = 0
      while (k < f) { s += x.data(r * f + k); k += 1 }
      val mu = s / f
      var v = 0.0
      k = 0
      while (k < f) { val d = x.data(r * f + k) - mu; v += d * d; k += 1 }
      val inv = 1.0 / math.sqrt(v / f + eps)
      k = 0
      while (k < f) {
        out(r * f + k) = (x.data(r * f + k) - mu) * inv * gamma(k) + beta(k)
        k += 1
      }
      r += 1
    }
    Tensor(x.shape, out)
  }

  /** visualEncoder GlobalLayerNorm (visualEncoder.py:85–99): one mean
    * and biased variance over ALL of C×L (mean-of-means over equal
    * sizes ≡ global mean), per-channel affine, eps 1e-8 inside √. */
  def globalLayerNorm(x: Tensor, gamma: Array[Double], beta: Array[Double]): Tensor = {
    val Array(c, l) = x.shape
    var s = 0.0
    var i = 0
    while (i < x.size) { s += x.data(i); i += 1 }
    val mu = s / x.size
    var v = 0.0
    i = 0
    while (i < x.size) { val d = x.data(i) - mu; v += d * d; i += 1 }
    val inv = 1.0 / math.pow(v / x.size + 1e-8, 0.5)
    val out = new Array[Double](x.size)
    var ch = 0
    while (ch < c) {
      var k = 0
      while (k < l) {
        out(ch * l + k) = gamma(ch) * (x.data(ch * l + k) - mu) * inv + beta(ch)
        k += 1
      }
      ch += 1
    }
    Tensor(x.shape, out)
  }

  // ---------------------------------------------------------------- pools

  /** nn.MaxPool2d (optional ceil_mode, as vgg[16] uses). Windows are
    * clipped to the input; ceil-mode windows starting past the end
    * are dropped (PyTorch semantics). */
  def maxPool2d(x: Tensor, kh: Int, kw: Int, sh: Int, sw: Int,
      padH: Int = 0, padW: Int = 0, ceil: Boolean = false): Tensor = {
    val Array(c, h, w) = x.shape
    var oh = outLen(h, kh, sh, padH, ceil = ceil)
    var ow = outLen(w, kw, sw, padW, ceil = ceil)
    // PyTorch: a ceil-mode window must start inside input+left-pad
    if (ceil && (oh - 1) * sh >= h + padH) oh -= 1
    if (ceil && (ow - 1) * sw >= w + padW) ow -= 1
    val out = new Array[Double](c * oh * ow)
    var ch = 0
    while (ch < c) {
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var m = Double.NegativeInfinity
          var ky = 0
          while (ky < kh) {
            val iy = oy * sh - padH + ky
            if (iy >= 0 && iy < h) {
              var kx = 0
              while (kx < kw) {
                val ix = ox * sw - padW + kx
                if (ix >= 0 && ix < w) {
                  val v = x.data((ch * h + iy) * w + ix)
                  if (v > m) m = v
                }
                kx += 1
              }
            }
            ky += 1
          }
          out((ch * oh + oy) * ow + ox) = m
          ox += 1
        }
        oy += 1
      }
      ch += 1
    }
    Tensor(Array(c, oh, ow), out)
  }

  /** nn.MaxPool3d for the frontend3D stem ((1,3,3) stride (1,2,2)
    * pad (0,1,1)) — depth axis handled as an outer loop. */
  def maxPool3d(x: Tensor, kd: Int, kh: Int, kw: Int,
      sd: Int, sh: Int, sw: Int, padD: Int, padH: Int, padW: Int): Tensor = {
    val Array(c, d, h, w) = x.shape
    val od = outLen(d, kd, sd, padD)
    val oh = outLen(h, kh, sh, padH)
    val ow = outLen(w, kw, sw, padW)
    val out = new Array[Double](c * od * oh * ow)
    var ch = 0
    while (ch < c) {
      var oz = 0
      while (oz < od) {
        var oy = 0
        while (oy < oh) {
          var ox = 0
          while (ox < ow) {
            var m = Double.NegativeInfinity
            var kz = 0
            while (kz < kd) {
              val iz = oz * sd - padD + kz
              if (iz >= 0 && iz < d) {
                var ky = 0
                while (ky < kh) {
                  val iy = oy * sh - padH + ky
                  if (iy >= 0 && iy < h) {
                    var kx = 0
                    while (kx < kw) {
                      val ix = ox * sw - padW + kx
                      if (ix >= 0 && ix < w) {
                        val v = x.data(((ch * d + iz) * h + iy) * w + ix)
                        if (v > m) m = v
                      }
                      kx += 1
                    }
                  }
                  ky += 1
                }
              }
              kz += 1
            }
            out(((ch * od + oz) * oh + oy) * ow + ox) = m
            ox += 1
          }
          oy += 1
        }
        oz += 1
      }
      ch += 1
    }
    Tensor(Array(c, od, oh, ow), out)
  }

  /** nn.AvgPool2d (count includes only in-bounds cells when unpadded
    * windows clip — here kernels always fit, as in ResNet's (4,4)). */
  def avgPool2d(x: Tensor, kh: Int, kw: Int, sh: Int, sw: Int): Tensor = {
    val Array(c, h, w) = x.shape
    val oh = outLen(h, kh, sh, 0)
    val ow = outLen(w, kw, sw, 0)
    val out = new Array[Double](c * oh * ow)
    var ch = 0
    while (ch < c) {
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var s = 0.0
          var ky = 0
          while (ky < kh) {
            var kx = 0
            while (kx < kw) {
              s += x.data((ch * h + oy * sh + ky) * w + ox * sw + kx)
              kx += 1
            }
            ky += 1
          }
          out((ch * oh + oy) * ow + ox) = s / (kh * kw)
          ox += 1
        }
        oy += 1
      }
      ch += 1
    }
    Tensor(Array(c, oh, ow), out)
  }

  /** AdaptiveAvgPool2d(1): global per-channel mean of a C×H×W. */
  def globalAvgPool(x: Tensor): Array[Double] = {
    val c = x.shape(0)
    val inner = x.size / c
    Array.tabulate(c) { ch =>
      var s = 0.0
      var i = 0
      while (i < inner) { s += x.data(ch * inner + i); i += 1 }
      s / inner
    }
  }

  // ---------------------------------------------------------------- nonlin

  def relu(x: Tensor): Tensor = x.map(v => if (v > 0) v else 0.0)
  def sigmoid(x: Tensor): Tensor = x.map(v => 1.0 / (1.0 + math.exp(-v)))

  /** nn.PReLU with a single shared alpha (its default). */
  def prelu(x: Tensor, alpha: Double): Tensor =
    x.map(v => if (v >= 0) v else alpha * v)

  /** Softmax over the last dim of an N×F tensor (max-shifted). */
  def softmaxRows(x: Tensor): Tensor = {
    val Array(n, f) = x.shape
    val out = new Array[Double](x.size)
    var r = 0
    while (r < n) {
      var m = Double.NegativeInfinity
      var k = 0
      while (k < f) { val v = x.data(r * f + k); if (v > m) m = v; k += 1 }
      var s = 0.0
      k = 0
      while (k < f) { val e = math.exp(x.data(r * f + k) - m); out(r * f + k) = e; s += e; k += 1 }
      k = 0
      while (k < f) { out(r * f + k) /= s; k += 1 }
      r += 1
    }
    Tensor(x.shape, out)
  }

  def add(a: Tensor, b: Tensor): Tensor = {
    require(a.size == b.size, s"add: $a vs $b")
    val out = new Array[Double](a.size)
    var i = 0
    while (i < a.size) { out(i) = a.data(i) + b.data(i); i += 1 }
    Tensor(a.shape, out)
  }

  /** Per-channel scale of a C×… tensor (the SE excitation apply). */
  def scaleChannels(x: Tensor, s: Array[Double]): Tensor = {
    val c = x.shape(0)
    val inner = x.size / c
    val out = new Array[Double](x.size)
    var ch = 0
    while (ch < c) {
      var i = 0
      while (i < inner) { out(ch * inner + i) = x.data(ch * inner + i) * s(ch); i += 1 }
      ch += 1
    }
    Tensor(x.shape, out)
  }

  // ---------------------------------------------------------------- attention

  /** nn.MultiheadAttention inference (attentionLayer.py:28 — eval
    * mode, no dropout, no masks): query T_q×D, key/value T_k×D;
    * packed in-proj weight 3D×D (+bias 3D), out-proj D×D. Scaling is
    * 1/√headDim applied to Q before QKᵀ. */
  /** In-proj slice `off` (0 = Q, d = K, 2d = V) applied to x. */
  private def inProj(x: Tensor, off: Int, d: Int,
      wIn: Tensor, bIn: Array[Double]): Tensor = {
    val w = Tensor(Array(d, d),
      java.util.Arrays.copyOfRange(wIn.data, off * d, (off + d) * d))
    val b = java.util.Arrays.copyOfRange(bIn, off, off + d)
    linear(x, w, Some(b))
  }

  /** Per-head scaled QKᵀ alignment scores — the tensor the attention
    * softmax normalizes, extracted so the q222 audit pins the packed
    * in-proj slicing (rows 0..d−1 = W_q, d..2d−1 = W_k) and the GEMM
    * against DuckDB on the SAME code path multiheadAttention runs.
    * Returns one T_q×T_k tensor per head. With head_dim a power of 4
    * the 1/√hd scale is an exact binary fraction, so integer weights
    * give exact scores. */
  def attentionScores(query: Tensor, key: Tensor, nHead: Int,
      wIn: Tensor, bIn: Array[Double]): Array[Tensor] = {
    val d = query.shape(1)
    require(d % nHead == 0, "d_model not divisible by nhead")
    val hd = d / nHead
    val tq = query.shape(0)
    val tk = key.shape(0)
    val q = inProj(query, 0, d, wIn, bIn)
    val k = inProj(key, d, d, wIn, bIn)
    val scale = 1.0 / math.sqrt(hd.toDouble)
    Array.tabulate(nHead) { h =>
      val sc = new Array[Double](tq * tk)
      var i = 0
      while (i < tq) {
        var j = 0
        while (j < tk) {
          var acc = 0.0
          var e = 0
          while (e < hd) { acc += q.data(i * d + h * hd + e) * scale * k.data(j * d + h * hd + e); e += 1 }
          sc(i * tk + j) = acc
          j += 1
        }
        i += 1
      }
      Tensor(Array(tq, tk), sc)
    }
  }

  def multiheadAttention(query: Tensor, key: Tensor, value: Tensor,
      nHead: Int, wIn: Tensor, bIn: Array[Double],
      wOut: Tensor, bOut: Array[Double]): Tensor = {
    val d = query.shape(1)
    require(d % nHead == 0, "d_model not divisible by nhead")
    val hd = d / nHead
    val tq = query.shape(0)
    val tk = key.shape(0)
    val v = inProj(value, 2 * d, d, wIn, bIn)
    val scores = attentionScores(query, key, nHead, wIn, bIn)
    val ctx = new Array[Double](tq * d)
    var h = 0
    while (h < nHead) {
      val at = softmaxRows(scores(h))
      var i = 0
      while (i < tq) {
        var e = 0
        while (e < hd) {
          var acc = 0.0
          var j = 0
          while (j < tk) { acc += at.data(i * tk + j) * v.data(j * d + h * hd + e); j += 1 }
          ctx(i * d + h * hd + e) = acc
          e += 1
        }
        i += 1
      }
      h += 1
    }
    linear(Tensor(Array(tq, d), ctx), wOut, Some(bOut))
  }
}
