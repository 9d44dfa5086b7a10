package graft.nn

import scala.collection.mutable

/** The q242 FULL-TALKNET detect audit: integer delta kernels that make
  * the real [[TalkNetModel.score]] forward — audio SE-ResNet34 stem,
  * visual 3D-conv + ResNet18 + V-TCN stem, cross attention A↔V, self
  * attention over the 256-d concat, lossAV head (reference
  * model/talkNetModel.py:8–63, demoTalkNet.py:225–272) — an exactly
  * known composition whose per-frame score DuckDB recomputes BIT FOR
  * BIT. The q221 construction, applied to the second network.
  *
  * Construction, stage by stage (see also the q221 scaladoc in
  * queries/NnQueries.scala for the shared tricks):
  *
  *  - AUDIO carries the signal as exact integers. Every BatchNorm is
  *    an EXACT identity: running_var = fl(1−eps) so that
  *    fl(var + eps) == 1.0 (the double nearest 1−eps plus eps rounds
  *    to exactly 1.0 — pinned by spec), γ=1, β=0, μ=0 ⇒ scale 1.0,
  *    shift 0.0. The SE excitation saturates: fc.2 weight 0, bias 40
  *    ⇒ sigmoid(40) = 1/(1+e⁻⁴⁰) rounds to exactly 1.0 (e⁻⁴⁰ ≈
  *    4.2e−18 < ulp(1)/2), so scaleChannels multiplies by exact 1.0.
  *    Each SE block's conv2 is zero ⇒ block ≡ relu(residual); the
  *    stride-2 / channel-change first blocks pass the signal through
  *    a per-channel δ 1×1 downsample (out c ← in c mod inC). The stem
  *    conv taps (ky=3,kx=3) on channel 0 and (ky=0,kx=3) elsewhere, so
  *    after the final frequency mean (f=2 — division by a power of
  *    two, exact) embedding dim c at frame t is
  *      A[t][c] = u_t  for c ≡ 0 (mod 16),  0 otherwise,
  *    where u_t = mfcc[4t][0] = mfcc[4t][8] — the per-frame integer
  *    the query derives from doc_id.
  *
  *  - VISUAL runs in full but contributes exact zeros (the q221
  *    zeroed-shallow-source move): all frontend/ResNet/TCN conv
  *    weights are 0, the gLN γ/β are 0 (its data-dependent 1/√var
  *    multiplies an exact (x−μ)=0), and the Conv1D head biases are 0,
  *    so V[t][·] ≡ 0 exactly while every conv/pool/norm executes.
  *
  *  - CROSS ATTENTION A2V: queries come from the zero visual rows, so
  *    q = b_q = 240·e₀. W_k taps A dim 0 ⇒ head-0 scores are
  *    240·0.25·u_s = 60·u_s (exact: 1/√16 = 0.25). The softmax
  *    SATURATES by design (the hazard the q221 audit discovered, used
  *    deliberately): score gaps ≥ 60 make the winner's weight exactly
  *    1.0 (Σ losers < ulp(1)/2) and loser contributions ≤ e⁻⁶⁰·u
  *    round away in the context accumulation — head 0 selects
  *    u* = max_t u_t EXACTLY. Heads 1–7 see all-zero scores ⇒ exact
  *    uniform weights 1/T (T a power of two) ⇒ context ū = (Σu)/T
  *    (exact dyadic). W_v
  *    taps A dim 0 (value rows u_s·𝟙), out_proj is the identity, so
  *    the attended row is [u*×16 dims, ū×112 dims] and the norm1
  *    input is the 4-class integer row
  *      B_t[c] = u_t+u* (c=0) | u* (c<16) | u_t+ū (c≡0 mod 16) | ū.
  *
  *  - LAYERNORMS carry the signal as REPRODUCIBLE doubles: B_t is
  *    exact dyadic, so μ and σ² are exact; the only inexact steps
  *    (+eps, sqrt, divide, multiply) are correctly-rounded IEEE ops
  *    that DuckDB reproduces bit-for-bit, and the later norms' folds
  *    over irrational rows are replicated in SQL with
  *    list_transform/list_reduce — DuckDB's left fold performs the
  *    same correctly-rounded additions in the same order as the JVM
  *    loop. FFNs are zero, crossV2A and selfAV attention paths are
  *    zero (uniform softmax over zero scores still runs), so the
  *    score is lossAV row [0,...,0,1-at-dim-0] applied to
  *    LN(LN([LN(LN(B_t)) ++ 0₁₂₈])) — four nested LayerNorms, each
  *    restated in the oracle.
  *
  * Weights reach the model through the REAL artifact path: a
  * torch-zip checkpoint (DoubleStorage — float32 would destroy the
  * fl(1−eps) identity) written by [[TorchCheckpointWriter]], fetched
  * and parsed by pipeline/ModelWeights.loadCheckpoint, broadcast, and
  * served through [[MapWeights]] with a THROWING fallback so any
  * parameter missing from the checkpoint fails loudly.
  */
object TalkNetAudit {

  // --------------------------------------------------------------- store

  /** Fallback that refuses: in the audit every parameter must come
    * from the checkpoint — silent pseudo-weights would unpin it. */
  object NoFallback extends WeightStore {
    override def tensor(name: String, shape: Int*): Tensor =
      throw new IllegalStateException(
        s"q242 audit: parameter $name missing from the checkpoint")
  }

  /** Records every (name, shape) the model requests — the state_dict
    * inventory for the checkpoint writer, captured by running one
    * tiny forward instead of hand-maintaining ~200 names. */
  final class RecordingWeights(inner: WeightStore) extends WeightStore {
    val seen: mutable.LinkedHashMap[String, Seq[Int]] = mutable.LinkedHashMap()
    override def tensor(name: String, shape: Int*): Tensor = {
      seen.getOrElseUpdate(name, shape.toSeq)
      inner.tensor(name, shape: _*)
    }
  }

  /** BatchNorm layers read through bnV (eps 1e-3) live under
    * visualFrontend; everything else norms with eps 1e-5
    * (TalkNet.scala:31–39). Identity needs var = fl(1−eps). */
  private def identityVar(name: String): Double =
    if (name.startsWith("visualFrontend.")) 1.0 - 1e-3 else 1.0 - 1e-5

  /** γ=1 BatchNorm / LayerNorm weight names (β, running_mean default
    * to the zero fallback). `.downsample.0.weight` is the conv — it
    * must NOT match, hence the explicit `.1.` forms. */
  private def isNormWeight(n: String): Boolean =
    n.endsWith(".bn1.weight") || n.endsWith(".bn2.weight") ||
      n.endsWith(".downsample.1.weight") || n.endsWith(".frontend3D.1.weight") ||
      n.endsWith(".bn1a.weight") || n.endsWith(".outbna.weight") ||
      n.endsWith(".bn1b.weight") || n.endsWith(".outbnb.weight") ||
      n.endsWith(".net.1.weight") ||
      n.endsWith(".norm1.weight") || n.endsWith(".norm2.weight")

  object Store extends WeightStore {
    override def tensor(name: String, shape: Int*): Tensor = {
      val n = shape.product
      def const(v: Double) = Tensor(shape.toArray, Array.fill(n)(v))
      def sparse(hot: (Int, Double)*) = {
        val d = new Array[Double](n)
        hot.foreach { case (i, v) => d(i) = v }
        Tensor(shape.toArray, d)
      }
      name match {
        // audio stem: channel 0 taps (ky=3,kx=3) → coefs {0,8} at the
        // two sampled frequency rows; other channels tap (0,3) → an
        // out-of-bounds row and coef 5, both zero in the q242 MFCC.
        case "audioEncoder.conv1.weight" =>
          val Seq(oc, _, kh, kw) = shape
          sparse((0 until oc).map { o =>
            val ky = if (o == 0) 3 else 0
            (((o * 1) * kh + ky) * kw + 3, 1.0)
          }: _*)
        // per-channel δ 1×1: out c ← in (c mod inC), so the 16 stem
        // channels stay distinct through every widening.
        case nm if nm.endsWith(".downsample.0.weight") =>
          val Seq(oc, ic, _, _) = shape
          sparse((0 until oc).map(o => (o * ic + o % ic, 1.0)): _*)
        // SE excitation saturated to an exact 1.0 (sigmoid(40))
        case nm if nm.endsWith(".se.fc.2.bias") => const(40.0)
        // cross A2V: q = 240·e0 (from the zero visual rows), W_k and
        // every W_v row tap A dim 0, out_proj = identity.
        case "crossA2V.self_attn.in_proj_weight" =>
          val Seq(_, d) = shape // (3d, d)
          sparse(Seq((d * d, 1.0)) ++ (2 * d until 3 * d).map(r => (r * d, 1.0)): _*)
        case "crossA2V.self_attn.in_proj_bias" => sparse((0, 240.0))
        case "crossA2V.self_attn.out_proj.weight" =>
          val Seq(d, _) = shape
          sparse((0 until d).map(r => (r * d + r, 1.0)): _*)
        // lossAV: score = face logit = av dim 0
        case "lossAV.FC.weight" =>
          val Seq(_, f) = shape
          sparse((1 * f + 0, 1.0))
        // norms: exact identities (γ=1; var makes fl(var+eps)=1.0;
        // β/μ fall through to zero)
        case nm if nm.endsWith("running_var") => const(identityVar(nm))
        case nm if isNormWeight(nm) => const(1.0)
        // V-TCN PReLU slope — runs on exact zeros either way (NOT
        // visualConv1D.net.3.weight, which is a conv and stays zero)
        case nm if nm.startsWith("visualTCN.") && nm.endsWith(".net.3.weight") =>
          const(1.0)
        // everything else: conv/linear/in_proj weights and all biases,
        // gLN γ/β, loc-equivalent paths — exact zeros
        case _ => const(0.0)
      }
    }
  }

  // --------------------------------------------------------------- input

  /** Frames per track. 2 — a power of two (the uniform heads' softmax
    * weights 1/T must be exact) — keeps the query's wall cost at one
    * ~1 GFLOP visual forward per doc; the 4 docs the query scores in
    * parallel cover both argmax positions and distinct u spreads. */
  val T = 2

  /** Per-frame integer the forward must carry: distinct within a doc
    * (61 ≢ 0 mod 89) so the head-0 argmax is tie-free, ≤ 89 so every
    * softmax gap is ≥ 60 — the saturation margin. The multiplier 61
    * splits the query's four docs (4/21/38/55) two against two on
    * the argmax position, covering both selection directions. */
  def uVal(doc: Long, t: Int): Double =
    (1L + ((doc * 31L + t.toLong * 61L) % 89L)).toDouble

  /** 4T MFCC rows × 13 coefficients (the reference's 100 Hz, 13-coef
    * layout, demoTalkNet.py:234): u_t at rows 4t, coefs 0 and 8 —
    * exactly the cells the δ-tap composition samples — zero elsewhere. */
  def mfccFor(doc: Long): Array[Array[Double]] =
    Array.tabulate(4 * T, 13) { (i, j) =>
      if (i % 4 == 0 && (j == 0 || j == 8)) uVal(doc, i / 4) else 0.0
    }

  /** T constant 112×112 grey frames (the reference crop size): the
    * zeroed visual stem ignores the values but runs every kernel. */
  val frames: Array[Array[Double]] = Array.fill(T)(Array.fill(112 * 112)(128.0))

  // ---------------------------------------------------------- closed form

  /** Bit-exact replication of Tensor.layerNorm's per-row loop (same
    * fold order, same operation shapes) — the algebra the oracle SQL
    * restates with list_reduce/list_transform. */
  private def ln(xs: Array[Double]): Array[Double] = {
    val f = xs.length
    var s = 0.0
    var k = 0
    while (k < f) { s += xs(k); k += 1 }
    val mu = s / f
    var v = 0.0
    k = 0
    while (k < f) { val d = xs(k) - mu; v += d * d; k += 1 }
    val inv = 1.0 / math.sqrt(v / f + 1e-5)
    xs.map(x => (x - mu) * inv * 1.0 + 0.0)
  }

  /** The composition's closed form: what TalkNetModel.score MUST
    * return on the q242 inputs, derived independently of the model
    * code (spec cross-check; the SQL oracle re-derives the same). */
  def expectedScores(doc: Long): Array[Double] = {
    val u = Array.tabulate(T)(uVal(doc, _))
    val uStar = u.max
    val uBar = u.sum / T // exact dyadic: integer sum / power of two
    Array.tabulate(T) { t =>
      val b = Array.tabulate(128) { c =>
        if (c == 0) u(t) + uStar
        else if (c < 16) uStar
        else if (c % 16 == 0) u(t) + uBar
        else uBar
      }
      val cat = ln(ln(b)) ++ new Array[Double](128)
      ln(ln(cat))(0)
    }
  }

  // ----------------------------------------------------------- checkpoint

  /** The audit state_dict as a REAL torch-zip checkpoint
    * (DoubleStorage): inventory recorded from one tiny forward, then
    * serialized. Lazy — one build per JVM, shared by query and spec. */
  lazy val checkpointBytes: Array[Byte] = {
    val rec = new RecordingWeights(Store)
    // enumeration forward: 1 frame / 4 MFCC rows requests every
    // parameter name+shape the real T=4 forward uses
    new TalkNetModel(rec).score(
      Array.tabulate(4, 13)((i, j) => if (i == 0 && (j == 0 || j == 8)) 5.0 else 0.0),
      Array.fill(1)(Array.fill(112 * 112)(128.0)), 112, 112)
    TorchCheckpointWriter.write(
      rec.seen.toSeq.map { case (nm, sh) =>
        nm -> ((sh, Store.tensor(nm, sh: _*).data))
      },
      doublePrecision = true)
  }

  lazy val checkpointSha256: String =
    graft.pipeline.ModelWeights.sha256Hex(checkpointBytes)
}
