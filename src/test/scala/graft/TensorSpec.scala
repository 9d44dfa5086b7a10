package graft

import graft.nn.Tensor
import graft.nn.Tensor._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed goldens for every inference kernel in graft.nn.Tensor
  * — PyTorch semantics (zero pad, clip-to-input pooling windows,
  * ceil-mode window-start rule, biased norm variance, packed MHA
  * in-proj) pinned on cases small enough to verify on paper. */
class TensorSpec extends AnyFunSuite {

  private def t(shape: Array[Int], d: Double*) = Tensor(shape, d.toArray)
  private val x33 = t(Array(1, 3, 3), 1, 2, 3, 4, 5, 6, 7, 8, 9)

  private def assertSeq(got: Array[Double], want: Seq[Double], tol: Double = 0.0): Unit = {
    assert(got.length == want.length, s"${got.toSeq} vs $want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= tol, s"${got.toSeq} vs $want")
    }
  }

  test("conv2d: 2x2 kernel, bias, no pad") {
    val y = conv2d(x33, t(Array(1, 1, 2, 2), 1, 2, 3, 4), Some(Array(10.0)))
    assert(y.shape.toSeq == Seq(1, 2, 2))
    assertSeq(y.data, Seq(47, 57, 77, 87))
  }

  test("conv2d: zero pad + stride 2") {
    val y = conv2d(x33, t(Array(1, 1, 2, 2), 1, 1, 1, 1), None,
      strideH = 2, strideW = 2, padH = 1, padW = 1)
    assert(y.shape.toSeq == Seq(1, 2, 2))
    assertSeq(y.data, Seq(1, 5, 11, 28))
  }

  test("conv2d: dilation 2") {
    val y = conv2d(x33, t(Array(1, 1, 2, 2), 1, 1, 1, 1), None, dilH = 2, dilW = 2)
    assert(y.shape.toSeq == Seq(1, 1, 1))
    assertSeq(y.data, Seq(20))
  }

  test("conv2d: groups (depthwise)") {
    val x = t(Array(2, 2, 2), 1, 2, 3, 4, 10, 20, 30, 40)
    val y = conv2d(x, t(Array(2, 1, 1, 1), 2, 3), None, groups = 2)
    assert(y.shape.toSeq == Seq(2, 2, 2))
    assertSeq(y.data, Seq(2, 4, 6, 8, 30, 60, 90, 120))
  }

  test("conv1d: k=2 sliding sum") {
    val y = conv1d(t(Array(1, 4), 1, 2, 3, 4), t(Array(1, 1, 2), 1, 1), None)
    assert(y.shape.toSeq == Seq(1, 3))
    assertSeq(y.data, Seq(3, 5, 7))
  }

  test("conv3d: full-volume sum") {
    val y = conv3d(t(Array(1, 2, 2, 2), 1, 2, 3, 4, 5, 6, 7, 8),
      t(Array(1, 1, 2, 2, 2), 1, 1, 1, 1, 1, 1, 1, 1), None, 1, 1, 1, 0, 0, 0)
    assert(y.shape.toSeq == Seq(1, 1, 1, 1))
    assertSeq(y.data, Seq(36))
  }

  test("maxPool2d: ceil mode clips windows to the input") {
    val y = maxPool2d(x33, 2, 2, 2, 2, ceil = true)
    assert(y.shape.toSeq == Seq(1, 2, 2))
    assertSeq(y.data, Seq(5, 6, 8, 9))
  }

  test("maxPool2d: ceil-mode window starting past input+pad is dropped") {
    // PyTorch MaxPool2d((1,2), stride=(1,3), padding=(0,1), ceil): the
    // naive ceil output width 3 would start its last window at 6 ≥ 4+1
    val y = maxPool2d(t(Array(1, 1, 4), 1, 2, 3, 4), 1, 2, 1, 3,
      padH = 0, padW = 1, ceil = true)
    assert(y.shape.toSeq == Seq(1, 1, 2))
    assertSeq(y.data, Seq(1, 4))
  }

  test("maxPool3d: depth-2 window") {
    val y = maxPool3d(t(Array(1, 2, 2, 2), 1, 2, 3, 4, 5, 6, 7, 8),
      2, 1, 1, 1, 1, 1, 0, 0, 0)
    assert(y.shape.toSeq == Seq(1, 1, 2, 2))
    assertSeq(y.data, Seq(5, 6, 7, 8))
  }

  test("avgPool2d + globalAvgPool") {
    val y = avgPool2d(t(Array(1, 2, 2), 1, 2, 3, 4), 2, 2, 1, 1)
    assertSeq(y.data, Seq(2.5))
    assertSeq(globalAvgPool(t(Array(2, 1, 2), 1, 3, 10, 30)), Seq(2, 20))
  }

  test("linear: wT product + bias") {
    val y = linear(t(Array(1, 3), 1, 2, 3),
      t(Array(2, 3), 1, 0, 1, 0, 1, 0), Some(Array(1.0, 2.0)))
    assertSeq(y.data, Seq(5, 4))
  }

  test("batchNorm: running-stat affine") {
    // scale = 3/sqrt(0.25+0.75) = 3, shift = 5 - 1*3 = 2 -> 3x+2
    val y = batchNorm(t(Array(1, 2), 2, 4), Array(3.0), Array(5.0),
      Array(1.0), Array(0.25), eps = 0.75)
    assertSeq(y.data, Seq(8, 14))
  }

  test("layerNorm: biased variance over last dim") {
    val inv = 1.0 / math.sqrt(1.0 + 1e-5) // mu=2, var=((−1)²+1²)/2=1
    val y = layerNorm(t(Array(1, 2), 1, 3), Array(1.0, 1.0), Array(0.0, 0.0))
    assertSeq(y.data, Seq(-inv, inv), 1e-12)
  }

  test("globalLayerNorm: one global mean/var, per-channel affine") {
    val inv = 1.0 / math.pow(5.0 + 1e-8, 0.5) // mu=4, var=(9+1+1+9)/4=5
    val y = globalLayerNorm(t(Array(2, 2), 1, 3, 5, 7),
      Array(1.0, 2.0), Array(0.0, 10.0))
    assertSeq(y.data, Seq(-3 * inv, -inv, 2 * inv + 10, 6 * inv + 10), 1e-12)
  }

  test("l2normScale: per-pixel channel L2") {
    val inv = 1.0 / (5.0 + 1e-10)
    val y = l2normScale(t(Array(2, 1, 1), 3, 4), Array(10.0, 20.0))
    assertSeq(y.data, Seq(30 * inv, 80 * inv), 1e-12)
  }

  test("softmaxRows: exact on log-integer logits") {
    val y = softmaxRows(t(Array(1, 2), 0.0, math.log(3.0)))
    assertSeq(y.data, Seq(0.25, 0.75), 1e-12)
  }

  test("relu / prelu / sigmoid") {
    assertSeq(relu(t(Array(2), -2, 3)).data, Seq(0, 3))
    assertSeq(prelu(t(Array(2), -2, 3), 0.5).data, Seq(-1, 3))
    assertSeq(sigmoid(t(Array(1), 0)).data, Seq(0.5))
  }

  test("scaleChannels + add") {
    assertSeq(scaleChannels(t(Array(2, 2), 1, 2, 3, 4), Array(2.0, 10.0)).data,
      Seq(2, 4, 30, 40))
    assertSeq(add(t(Array(2), 1, 2), t(Array(2), 10, 20)).data, Seq(11, 22))
  }

  test("multiheadAttention: identity projections reduce to softmax(QKᵀ/√d)V") {
    val d = 2
    val eye = Array(1.0, 0, 0, 1)
    val wIn = Tensor(Array(3 * d, d), eye ++ eye ++ eye)
    val x = t(Array(2, 2), 1, 0, 0, 1)
    val y = multiheadAttention(x, x, x, nHead = 1,
      wIn, new Array[Double](3 * d), Tensor(Array(d, d), eye), new Array[Double](d))
    // per row: scores (s, 0)/√2-scaled on the diagonal element
    val s = 1.0 / math.sqrt(2.0)
    val p = math.exp(s) / (math.exp(s) + 1.0)
    assertSeq(y.data, Seq(p, 1 - p, 1 - p, p), 1e-12)
  }

  test("outLen: floor vs ceil") {
    assert(outLen(7, 3, 2, 1) == 4)
    assert(outLen(7, 3, 2, 0) == 3)
    assert(outLen(7, 3, 2, 0, ceil = true) == 3) // (7-3)/2 exact: no change
    assert(outLen(6, 3, 2, 0) == 2)
    assert(outLen(6, 3, 2, 0, ceil = true) == 3)
    assert(outLen(5, 2, 2, 0) == 2)
    assert(outLen(5, 2, 2, 0, ceil = true) == 3)
  }
}
