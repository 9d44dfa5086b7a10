package graft.queries

import graft.nn.Tensor
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable audits of the neural-network inference kernels
  * (graft.nn.Tensor) — the same conv2d/maxPool2d/linear/relu code the
  * S3fdNet and TalkNetModel forwards are built from (reference
  * model/faceDetector/s3fd/nets.py:28–174, model/audioEncoder.py:
  * 54–108, model/visualEncoder.py:100–172).
  *
  * Oracle strategy: with integer-valued weights and inputs every
  * kernel is EXACT (the accumulations stay far inside 2^53), so a
  * DuckDB relational re-statement — conv as a kernel-offset join +
  * group-by sum, pooling as a group-by max, the dense layer as a
  * weight-formula join — must hash-match bit for bit. This pins the
  * kernels' indexing, padding, striding and bias semantics against an
  * independent engine, which is exactly the guarantee the float
  * forwards (S3fdNet/TalkNetModel, spec-pinned) inherit.
  *
  * Scale: q132 is a bounded kernel audit (32 synthetic 8×8 images,
  * like the q65/q66 in-kernel reductions); q133 runs the MLP over the
  * FULL embeddings corpus — map-only per-partition inference, no
  * shuffle until the final output sort, the 100 TB deployment shape
  * for model scoring (weights built once per partition, O(1) memory).
  */
object NnQueries extends QueryPack {
  import Q.Fn

  // ---------------------------------------------------------- q132 kernel

  /** pixel(p) for image `docId` — positive modular arithmetic only,
    * exact in BIGINT and in double (≤ 2^53). */
  private[queries] def pixel(docId: Long, p: Int): Double =
    ((docId * 2654435761L + p.toLong * 40503L + 97L) % 251L).toDouble

  /** The q132/q223 weight set, as closed-form integer formulas
    * (mirrored term-for-term in the oracle SQL). */
  private[queries] object ConvNetParams {
    // flat i = o*9 + ky*3 + kx (C=1) — the SQL kernel formula's index
    val w1: Array[Double] = Array.tabulate(36)(i => ((i.toLong * 7L) % 5L - 2L).toDouble)
    val b1: Array[Double] = Array.tabulate(4)(o => (o % 3 - 1).toDouble)
    val w2: Array[Double] = Array.tabulate(192)(i => ((i.toLong * 11L) % 7L - 3L).toDouble)
    val b2: Array[Double] = Array.tabulate(3)(c => (c - 1).toDouble)
  }

  /** conv(4,1,3,3) w/ bias → relu → maxpool 2×2/2 → linear(64→3) with
    * caller-supplied parameters (q132 feeds the formulas directly,
    * q223 the same values round-tripped through a torch checkpoint). */
  private[queries] def convForwardW(docId: Long, w1: Array[Double], b1: Array[Double],
      w2: Array[Double], b2: Array[Double]): (Long, Long, Long, Long) = {
    val img = Tensor(Array(1, 8, 8), Array.tabulate(64)(pixel(docId, _)))
    val act = Tensor.relu(Tensor.conv2d(img, Tensor(Array(4, 1, 3, 3), w1),
      Some(b1), padH = 1, padW = 1))
    val pooled = Tensor.maxPool2d(act, 2, 2, 2, 2) // 4×4×4, flat = o*16+y*4+x
    val s = Tensor.linear(Tensor(Array(1, 64), pooled.data),
      Tensor(Array(3, 64), w2), Some(b2)).data
    var best = 0
    var c = 1
    while (c < 3) { if (s(c) > s(best)) best = c; c += 1 } // tie → lowest class
    (s(0).toLong, s(1).toLong, s(2).toLong, best.toLong)
  }

  private[queries] def convForward(docId: Long): (Long, Long, Long, Long) =
    convForwardW(docId, ConvNetParams.w1, ConvNetParams.b1,
      ConvNetParams.w2, ConvNetParams.b2)

  // ---------------------------------------------------------- q133 mlp

  /** The q133 model parameters for one embedding width — built once
    * per (partition, dim), not per row: at corpus scale the weight
    * tensors are loop-invariant state exactly like a real model's. */
  private final class MlpWeights(dim: Int) {
    val w1 = Tensor(Array(8, dim), Array.tabulate(8 * dim) { f =>
      val j = f / dim; val i = f % dim
      ((j.toLong * 131L + i.toLong) * 13L % 9L - 4L).toDouble
    })
    val b1 = Array.tabulate(8)(j => (j % 5 - 2).toDouble)
    val w2 = Tensor(Array(4, 8), Array.tabulate(32) { f =>
      val c = f / 8; val j = f % 8
      ((c.toLong * 67L + j.toLong) * 17L % 11L - 5L).toDouble
    })
    val b2 = Array.tabulate(4)(c => (c % 3 - 1).toDouble)
  }

  /** relu(q·W1ᵀ+b1)·W2ᵀ+b2 over the floor(32·e) quantized embedding;
    * dim-independent weight formulas (no hardcoded width). */
  private def mlpForwardW(e: Array[Float], ws: MlpWeights): (Long, Long, Long, Long, Long) = {
    val dim = e.length
    // float→double is exact and ·32 is a power-of-two scale, so
    // floor() sees the identical double in Spark and DuckDB
    val q = Array.tabulate(dim)(i => math.floor(e(i).toDouble * 32.0))
    val h = Tensor.relu(Tensor.linear(Tensor(Array(1, dim), q), ws.w1, Some(ws.b1)))
    val s = Tensor.linear(h, ws.w2, Some(ws.b2)).data
    var best = 0
    var c = 1
    while (c < 4) { if (s(c) > s(best)) best = c; c += 1 }
    (s(0).toLong, s(1).toLong, s(2).toLong, s(3).toLong, best.toLong)
  }

  private[queries] def mlpForward(e: Array[Float]): (Long, Long, Long, Long, Long) =
    mlpForwardW(e, new MlpWeights(e.length))

  // ---------------------------------------------------------- q134 deep

  /** Depthwise (groups=2) stride-2 dilated conv on a 2-channel image —
    * the conv code paths q132 doesn't reach (grouped channel slicing,
    * strided output grid, dilated taps), same exact-integer oracle. */
  private[queries] def deepForward(docId: Long): (Long, Long) = {
    val img = Tensor(Array(2, 8, 8),
      Array.tabulate(128)(p => ((docId * 2654435761L + p.toLong * 40503L + 97L) % 251L).toDouble))
    val w1 = Tensor(Array(2, 1, 3, 3),
      Array.tabulate(18)(i => ((i.toLong * 5L) % 7L - 3L).toDouble))
    val b1 = Array.tabulate(2)(o => (o * 2 - 1).toDouble)
    val act = Tensor.relu(Tensor.conv2d(img, w1, Some(b1),
      strideH = 2, strideW = 2, padH = 2, padW = 2, dilH = 2, dilW = 2, groups = 2))
    // 2×4×4 → flat o*16 + y*4 + x
    val w2 = Tensor(Array(2, 32),
      Array.tabulate(64)(f => ((f.toLong * 3L) % 5L - 2L).toDouble))
    val b2 = Array.tabulate(2)(c => c.toDouble)
    val t = Tensor.linear(Tensor(Array(1, 32), act.data), w2, Some(b2)).data
    (t(0).toLong, t(1).toLong)
  }

  // ---------------------------------------------------------- q225 conv3d

  /** The TalkNet visual stem's kernel family in miniature (reference
    * model/visualEncoder.py:101–110: Conv3d (5,7,7)/(1,2,2)/(2,3,3)
    * then MaxPool3d (1,3,3)/(1,2,2)/(0,1,1)) — conv3d + relu +
    * maxPool3d with the SAME stride/pad semantics on a 1×4×8×8 integer
    * voxel grid, exact under the q132 integer-weight oracle. Covers
    * the 3-D code paths (depth axis indexing, 5-D weight layout,
    * pool's exclude-padding max) that the conv2d audits can't reach. */
  private[queries] def conv3dForward(docId: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val vox = Tensor(Array(1, 4, 8, 8), Array.tabulate(256) { p =>
      ((docId * 2654435761L + p.toLong * 40503L + 97L) % 251L).toDouble
    })
    // flat = o*27 + kd*9 + ky*3 + kx (C=1)
    val w = Tensor(Array(2, 1, 3, 3, 3),
      Array.tabulate(54)(i => ((i.toLong * 7L) % 5L - 2L).toDouble))
    val b = Array.tabulate(2)(o => (o * 2 - 1).toDouble)
    val conv = Tensor.relu(Tensor.conv3d(vox, w, Some(b),
      strideD = 1, strideH = 2, strideW = 2, padD = 1, padH = 1, padW = 1))
    val pooled = Tensor.maxPool3d(conv, 1, 3, 3, 1, 2, 2, 0, 1, 1) // 2×4×2×2
    for {
      o <- 0 until 2; d <- 0 until 4; y <- 0 until 2; x <- 0 until 2
    } yield (o.toLong, d.toLong, y.toLong, x.toLong,
      pooled.data(((o * 4 + d) * 2 + y) * 2 + x).toLong)
  }

  // ---------------------------------------------------------- q227 conv1d

  /** The V-TCN's kernel family in miniature (reference
    * model/visualEncoder.py:133–147 DSConv1d: depthwise k3 conv1d →
    * PReLU → pointwise 1×1): depthwise-grouped conv1d + PReLU (alpha
    * 2, inputs span negative values so BOTH branches execute) +
    * pointwise channel mix on integer series — exact under the q132
    * integer-weight oracle. Covers the 1-D/grouped/pointwise paths
    * and the PReLU negative branch that relu-only audits miss. */
  private[queries] def conv1dForward(docId: Long): Seq[(Long, Long, Long)] = {
    val x = Tensor(Array(4, 16), Array.tabulate(64) { p =>
      (((docId * 2654435761L + p.toLong * 40503L + 97L) % 251L) - 125L).toDouble
    })
    val dw = Tensor.conv1d(x,
      Tensor(Array(4, 1, 3), Array.tabulate(12)(i => ((i.toLong * 7L) % 5L - 2L).toDouble)),
      Some(Array.tabulate(4)(c => (c % 3 - 1).toDouble)), pad = 1, groups = 4)
    val pr = Tensor.prelu(dw, 2.0)
    val pw = Tensor.conv1d(pr,
      Tensor(Array(2, 4, 1), Array.tabulate(8)(i => ((i.toLong * 11L) % 7L - 3L).toDouble)),
      Some(Array.tabulate(2)(o => (o - 1).toDouble)))
    for { o <- 0 until 2; t <- 0 until 16 }
      yield (o.toLong, t.toLong, pw.data(o * 16 + t).toLong)
  }

  // ------------------------------------------------------ q221 full S3FD

  /** Weight store for the q221 FULL-NETWORK detect audit: integer
    * delta kernels that make the real S3fdNet forward an exactly-known
    * composition, so the whole path — all 15 VGG convs (incl. the
    * dilated fc6/fc7), the ceil-mode pool, the L2Norm sources, the
    * stride-2 extras, the 6 loc/conf heads with the head-0 max-out,
    * PriorBox, decode, BOTH NMS passes and the conf_th prefix — runs
    * for real and lands on a DuckDB-recomputable answer.
    *
    * Construction (reference model/faceDetector/s3fd/nets.py:28–174):
    *  - every trunk conv copies input channel 0 through one unit tap;
    *    vgg.2 taps (ky=1,kx=2) and vgg.7 taps (2,1) — DELIBERATE
    *    off-center taps, so a transposed/reflected kernel index would
    *    shift the receptive window and flip the answer for the docs
    *    whose hot pixel sits on the clipped border;
    *  - vgg.0 bias +123 undoes the preprocess mean on the B channel,
    *    so the carried value is the raw blue byte (≥ 0 → relu is
    *    identity and every activation stays an exact small integer);
    *  - the three L2Norm scales are zero: shallow sources vanish and
    *    their heads emit pure bias (exact even though the norm itself
    *    divides by a sqrt), with conf.0's bias (10,10,10,0) driving
    *    the REAL max-out background trick to a constant −10 logit gap
    *    → every shallow prior fails the 0.05 conf gate;
    *  - deep conf heads read the carried value M (the max of the
    *    shifted raster window after five pools): conf.3 face logit =
    *    M with bg bias 126, conf.4 = 3·M vs 397 (slope 3 makes the
    *    score ORDER flip at M = 135.5 — never a tie on integers),
    *    conf.5 = M vs 130. The hot range keeps every logit gap within
    *    ±36: beyond |g| ≈ 36.7 the two-class softmax SATURATES to an
    *    exact 1.0 double, distinct gaps collide, and NMS tie-breaking
    *    (larger index first) silently reorders the keep list — found
    *    by this very audit's first run;
    *  - loc heads are zero → decode sees exp(0) = 1 and the boxes are
    *    the priors themselves, exact binary fractions at imw = 32.
    */
  private[graft] object S3fdAuditStore extends graft.nn.WeightStore {
    private def zeros(shape: Seq[Int]) =
      Tensor(shape.toArray, new Array[Double](shape.product))
    /** Unit tap on input channel 0 at (ky,kx) for every out channel. */
    private def delta(shape: Seq[Int], ky: Int, kx: Int): Tensor = {
      val Seq(oc, ic, kh, kw) = shape
      val d = new Array[Double](oc * ic * kh * kw)
      var o = 0
      while (o < oc) { d(((o * ic) * kh + ky) * kw + kx) = 1.0; o += 1 }
      Tensor(shape.toArray, d)
    }
    /** conf head: face channel (o=1) = slope × center tap of ch 0. */
    private def confFace(shape: Seq[Int], slope: Double): Tensor = {
      val Seq(_, ic, kh, kw) = shape
      val d = new Array[Double](shape.product)
      d(((1 * ic) * kh + kh / 2) * kw + kw / 2) = slope
      Tensor(shape.toArray, d)
    }
    private def const(shape: Seq[Int], vs: Double*) =
      Tensor(shape.toArray, vs.toArray)
    override def tensor(name: String, shape: Int*): Tensor = name match {
      case "vgg.0.weight"  => delta(shape, 1, 1)
      case "vgg.0.bias"    => Tensor(shape.toArray, Array.fill(shape.product)(123.0))
      case "vgg.2.weight"  => delta(shape, 1, 2) // x-shift tap
      case "vgg.7.weight"  => delta(shape, 2, 1) // y-shift tap
      case "vgg.33.weight" => delta(shape, 0, 0) // 1×1
      case n if n.startsWith("vgg.") && n.endsWith(".weight") => delta(shape, 1, 1)
      case "extras.0.weight" | "extras.2.weight" => delta(shape, 0, 0) // 1×1
      case "extras.1.weight" | "extras.3.weight" => delta(shape, 1, 1)
      case "conf.0.bias" => const(shape, 10, 10, 10, 0) // max-out bg wins
      case "conf.1.bias" | "conf.2.bias" => const(shape, 10, 0)
      case "conf.3.weight" => confFace(shape, 1.0)
      case "conf.3.bias"   => const(shape, 126, 0)
      case "conf.4.weight" => confFace(shape, 3.0)
      case "conf.4.bias"   => const(shape, 397, 0)
      case "conf.5.weight" => confFace(shape, 1.0)
      case "conf.5.bias"   => const(shape, 130, 0)
      case _ => zeros(shape) // remaining biases, loc/shallow-conf heads, L2Norm γ
    }
  }

  /** q221 raster: 32×32 grey RGB, baseline (p·7) mod 50 with one hot
    * pixel at p0 = (doc·733) mod 1024 of height 128 + (doc·7) mod 16.
    * The shifted-window max the net computes is over rows 2..31 ×
    * cols 1..31, so docs whose hot pixel lands on the clipped border
    * (e.g. doc 32: x=0; doc 7: y=0) fall back to the baseline max 49
    * and detect NOTHING — the rows that catch tap-direction bugs. */
  private[graft] def q221Raster(doc: Long): Array[Int] = {
    val p0 = ((doc * 733L) % 1024L).toInt
    val hot = (128L + (doc * 7L) % 16L).toInt
    val px = new Array[Int](1024 * 3)
    var p = 0
    while (p < 1024) {
      val v = if (p == p0) hot else (p * 7) % 50
      px(3 * p) = v; px(3 * p + 1) = v; px(3 * p + 2) = v
      p += 1
    }
    px
  }

  /** The closed-form value the trunk must compute (spec cross-check). */
  private[graft] def q221WindowMax(doc: Long): Int = {
    val px = q221Raster(doc)
    var m = 0
    var y = 2
    while (y < 32) {
      var x = 1
      while (x < 32) { m = math.max(m, px(3 * (y * 32 + x))); x += 1 }
      y += 1
    }
    m
  }

  val queries = Map[String, Fn](
    // CNN kernel audit: the real Tensor.conv2d/relu/maxPool2d/linear
    // chain on 32 deterministic 8×8 integer images, every value
    // hash-matched against the relational restatement in DuckDB.
    "q132_nn_conv" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).orderBy(col("doc_id")).limit(32)
        .as[Long]
        .mapPartitions(_.map { id =>
          val (s0, s1, s2, pred) = convForward(id)
          (id, s0, s1, s2, pred)
        })
        .toDF("doc_id", "s0", "s1", "s2", "pred")
        .orderBy(col("doc_id"))
    },

    // Grouped/strided/dilated conv audit (the q132 companion): 32
    // 2-channel images through a depthwise stride-2 dilation-2 conv,
    // relu, dense head — hash-matched against the DuckDB restatement.
    "q134_nn_deep" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).orderBy(col("doc_id")).limit(32)
        .as[Long]
        .mapPartitions(_.map { id =>
          val (t0, t1) = deepForward(id)
          (id, t0, t1)
        })
        .toDF("doc_id", "t0", "t1")
        .orderBy(col("doc_id"))
    },

    // FULL S3FD NETWORK under the oracle gate: S3fdNet.forward — the
    // real VGG16-with-dilated-fc7 trunk, L2Norm sources, extras and
    // all six heads — runs per doc on the q221 raster with the
    // integer delta-kernel AuditStore, then the REAL priors → softmax
    // → decode → NMS(0.3) → conf_th prefix → nms_(0.1) chain picks
    // the detections. DuckDB recomputes the composition (a windowed
    // max + the integer gate/order decision tree + the exact prior
    // boxes); any indexing error anywhere in the forward or the
    // post-chain flips rows. This is q112 with the REAL trunk seated
    // in front — the last NN surface the round-9 verdict flagged.
    // (prefix gates at M≥128/133/132, score-order flip at M=135.5,
    // survivor sets {128}, {128,512}, {256} — see the store scaladoc)
    "q221_s3fd_forward" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "customer")
        .select(col("c_custkey").cast("long")).orderBy(col("c_custkey")).limit(16)
        .as[Long]
        .repartition(16)
        .mapPartitions { it =>
          // one net per partition — the weights object is shared state
          // exactly like a broadcast checkpoint at deployment scale.
          // 16 docs: doc·7 mod 16 covers every hot height (all three
          // survivor zones + the doc-7 clipped-border empty zone);
          // more docs only re-prove the same cells while the 32²
          // VGG forwards contend for memory bandwidth.
          val net = new graft.nn.S3fdNet(S3fdAuditStore)
          it.flatMap { doc =>
            graft.nn.S3fdNet.detectImage(net, q221Raster(doc), 32, 32, confTh = 0.8)
              .map { case (x1, y1, x2, y2, _) =>
                (doc, math.round(x2 - x1), x1, y1, x2, y2)
              }
          }
        }
        .toDF("doc_id", "scale_px", "x1", "y1", "x2", "y2")
        .orderBy(col("doc_id"), col("scale_px"))
    },

    // 1-D DEPTHWISE/POINTWISE conv + PReLU audit (the V-TCN DSConv
    // kernel family): exact integer forward per doc, hash-matched
    // against the DuckDB restatement — grouped channel slicing on the
    // 1-D path and the PReLU negative branch included.
    "q227_nn_conv1d" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") % 3 === 2)
        .orderBy(col("doc_id")).limit(16)
        .as[Long]
        .mapPartitions(_.flatMap { id =>
          conv1dForward(id).map { case (o, t, v) => (id, o, t, v) }
        })
        .toDF("doc_id", "o", "t", "v")
        .orderBy(col("doc_id"), col("o"), col("t"))
    },

    // 3-D CONV/POOL kernel audit: the TalkNet visual-stem ops
    // (conv3d stride (1,2,2) + exclude-padding maxPool3d) on 16
    // integer voxel grids, every pooled cell hash-matched against the
    // DuckDB restatement — the depth-axis indexing q132/q134 can't see.
    "q225_nn_conv3d" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") % 5 === 1)
        .orderBy(col("doc_id")).limit(16)
        .as[Long]
        .mapPartitions(_.flatMap { id =>
          conv3dForward(id).map { case (o, d, y, x, v) => (id, o, d, y, x, v) }
        })
        .toDF("doc_id", "o", "d", "y", "x", "v")
        .orderBy(col("doc_id"), col("o"), col("d"), col("y"), col("x"))
    },

    // CHECKPOINT-DRIVEN INFERENCE under the oracle gate: the q132
    // weights are written as a REAL torch-zip checkpoint
    // (TorchCheckpointWriter), fetched + parsed through the FULL
    // production seam — ModelWeights.loadCheckpoint → pickle VM →
    // storage decode → MapWeights — broadcast, and the forward runs
    // from the PARSED tensors. The oracle recomputes from the weight
    // FORMULAS, so the hash matches iff every byte survives
    // pickle→zip→fetch→parse→float32→forward intact: the "real
    // forwards run real weights" contract, end to end, under the
    // gate. (Distinct doc subset from q132: doc_id ≡ 3 mod 7.)
    "q223_checkpoint_infer" -> { (s, dir) =>
      import s.implicits._
      val ck = graft.nn.TorchCheckpointWriter.write(Seq(
        "conv.weight" -> ((Seq(4, 1, 3, 3), ConvNetParams.w1)),
        "conv.bias" -> ((Seq(4), ConvNetParams.b1)),
        "fc.weight" -> ((Seq(3, 64), ConvNetParams.w2)),
        "fc.bias" -> ((Seq(3), ConvNetParams.b2))))
      val scratch = Q.scratchDir(s, "graft_ckpt")
      val src = java.nio.file.Paths.get(scratch, "model.pth")
      java.nio.file.Files.write(src, ck)
      // the reference contract: artifact fetch-if-missing (+ checksum
      // pin), then torch.load — demoTalkNet.py:58–61 made real
      val ws = graft.pipeline.ModelWeights.loadCheckpoint(
        s"file:$src", "model.pth", s"$scratch/cache",
        sha256 = Some(graft.pipeline.ModelWeights.sha256Hex(ck)))
      val bc = s.sparkContext.broadcast(ws.params)
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") % 7 === 3)
        .orderBy(col("doc_id")).limit(24)
        .as[Long]
        .mapPartitions { it =>
          val p = bc.value
          it.map { id =>
            val (s0, s1, s2, pred) = convForwardW(id,
              p("conv.weight"), p("conv.bias"), p("fc.weight"), p("fc.bias"))
            (id, s0, s1, s2, pred)
          }
        }
        .toDF("doc_id", "s0", "s1", "s2", "pred")
        .orderBy(col("doc_id"))
    },

    // ATTENTION ALIGNMENT under the oracle gate (the q132 trick on the
    // TalkNet attention stack, model/attentionLayer.py:6–36 /
    // talkNetModel.py:29–63): Tensor.attentionScores — the SAME code
    // multiheadAttention normalizes, packed in-proj slicing included
    // (rows 0..d−1 = W_q, d..2d−1 = W_k) — runs on integer token
    // sequences with closed-form integer weights. head_dim = 4 makes
    // the 1/√hd scale an exact 0.5, so every QKᵀ score is an exact
    // half-integer; the output is each query's ARGMAX key (softmax is
    // monotone — the alignment is what it decides) plus 2·score as an
    // exact BIGINT. DuckDB recomputes the projections as join-sums and
    // the argmax with the same lowest-index tie-break. Swapped q/k
    // slices, transposed GEMMs or head-dim mis-slicing all flip rows.
    "q222_attention_align" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "embeddings")
        .filter(col("vec_id") < 64)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .groupByKey(_._1 / 8)
        .flatMapGroups { (seq, it) =>
          val toks = it.toArray.sortBy(_._1)
          val d = 16
          val x = Tensor(Array(toks.length, d),
            toks.flatMap(t => t._2.take(d).map(f => math.floor(f.toDouble * 32.0))))
          val wIn = Tensor(Array(3 * d, d), Array.tabulate(3 * d * d) { i =>
            ((i / d) * 13 + (i % d) * 7) % 9 - 4
          }.map(_.toDouble))
          val bIn = Array.tabulate(3 * d)(r => (r % 5 - 2).toDouble)
          val heads = Tensor.attentionScores(x, x, nHead = 4, wIn, bIn)
          for {
            h <- heads.indices.iterator
            i <- 0 until toks.length
          } yield {
            val tk = toks.length
            var best = 0
            var j = 1
            while (j < tk) {
              if (heads(h).data(i * tk + j) > heads(h).data(i * tk + best)) best = j
              j += 1
            }
            (seq, h.toLong, i.toLong, best.toLong,
              (2.0 * heads(h).data(i * tk + best)).toLong)
          }
        }
        .toDF("seq", "head", "qpos", "kpos", "s2")
        .orderBy(col("seq"), col("head"), col("qpos"))
    },

    // FULL TALKNET AV FORWARD under the oracle gate (the q221 move on
    // the second network, composed with the q223 checkpoint path):
    // TalkNetModel.score — audio SE-ResNet34 stem, full visual 3D-conv
    // + ResNet18 + V-TCN stem, cross attention A↔V with a REAL
    // saturated softmax selection, self attention, lossAV head — runs
    // per doc on integer MFCC input with the TalkNetAudit delta
    // kernels, weights round-tripped through a REAL torch-zip
    // DoubleStorage checkpoint (write → fetch+sha → pickle-VM parse →
    // MapWeights broadcast). DuckDB recomputes the per-frame score
    // BIT FOR BIT: the four nested LayerNorms are restated as
    // list_transform/list_reduce folds (DuckDB's left fold performs
    // the same correctly-rounded IEEE adds in the same order as the
    // JVM loop), everything upstream is exact integer/dyadic algebra.
    // Any indexing error anywhere in either stem, the attention
    // wiring, the norm order, or the checkpoint roundtrip flips bits.
    "q242_talknet_forward" -> { (s, dir) =>
      import s.implicits._
      val scratch = Q.scratchDir(s, "graft_tnet")
      val src = java.nio.file.Paths.get(scratch, "talknet_audit.pth")
      java.nio.file.Files.write(src, graft.nn.TalkNetAudit.checkpointBytes)
      val ws = graft.pipeline.ModelWeights.loadCheckpoint(
        s"file:$src", "talknet_audit.pth", s"$scratch/cache",
        sha256 = Some(graft.nn.TalkNetAudit.checkpointSha256))
      val bc = s.sparkContext.broadcast(ws.params)
      Tables.table(s, dir, "documents")
        .select(col("doc_id")).filter(col("doc_id") % 17 === 4)
        .orderBy(col("doc_id")).limit(4)
        .as[Long]
        .repartition(4) // one ~1 GFLOP visual forward per partition
        .mapPartitions { it =>
          // one model per partition from the broadcast checkpoint;
          // NoFallback: every parameter must come from the .pth
          val model = new graft.nn.TalkNetModel(
            graft.nn.MapWeights(bc.value, graft.nn.TalkNetAudit.NoFallback))
          it.flatMap { doc =>
            val scores = model.score(graft.nn.TalkNetAudit.mfccFor(doc),
              graft.nn.TalkNetAudit.frames, 112, 112)
            scores.iterator.zipWithIndex.map { case (sc, t) => (doc, t.toLong, sc) }
          }
        }
        .toDF("doc_id", "frame", "score")
        .orderBy(col("doc_id"), col("frame"))
    },

    // Distributed model scoring: the 2-layer integer MLP over EVERY
    // embedding row — per-partition inference (the weights are built
    // inside the partition, nothing is shuffled but the output sort).
    "q133_nn_mlp" -> { (s, dir) =>
      import s.implicits._
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          var ws: MlpWeights = null // one build per (partition, dim)
          it.map { case (id, e) =>
            if (ws == null || ws.w1.dim(1) != e.length) ws = new MlpWeights(e.length)
            val (s0, s1, s2, s3, pred) = mlpForwardW(e, ws)
            (id, s0, s1, s2, s3, pred)
          }
        }
        .toDF("vec_id", "s0", "s1", "s2", "s3", "pred")
        .orderBy(col("vec_id"))
    },
  )

  /** The conv/pool/linear oracle restatement over a docs CTE (q132 +
    * the q223 checkpoint roundtrip run the same network). */
  private def convSql(docsCte: String): String =
    s"""WITH docs AS ($docsCte),
         |px AS (
         |  SELECT d.doc_id, y.range AS y, x.range AS x,
         |    (d.doc_id*2654435761 + (y.range*8 + x.range)*40503 + 97) % 251 AS v
         |  FROM docs d, range(8) y, range(8) x),
         |grid AS (
         |  SELECT d.doc_id, o.range AS o, oy.range AS oy, ox.range AS ox,
         |         ky.range AS ky, kx.range AS kx
         |  FROM docs d, range(4) o, range(8) oy, range(8) ox,
         |       range(3) ky, range(3) kx),
         |conv AS (
         |  SELECT g.doc_id, g.o, g.oy, g.ox,
         |    SUM(COALESCE(p.v, 0) * ((g.o*9 + g.ky*3 + g.kx)*7 % 5 - 2))
         |      + (g.o % 3 - 1) AS cv
         |  FROM grid g LEFT JOIN px p
         |    ON p.doc_id = g.doc_id AND p.y = g.oy - 1 + g.ky
         |   AND p.x = g.ox - 1 + g.kx
         |  GROUP BY 1, 2, 3, 4),
         |pool AS (
         |  SELECT doc_id, o, oy // 2 AS py, ox // 2 AS qx,
         |         MAX(GREATEST(cv, 0)) AS pv
         |  FROM conv GROUP BY 1, 2, 3, 4),
         |lin AS (
         |  SELECT p.doc_id, c.range AS cls,
         |    SUM(p.pv * ((c.range*64 + (p.o*16 + p.py*4 + p.qx))*11 % 7 - 3))
         |      + (c.range - 1) AS sc
         |  FROM pool p, range(3) c
         |  GROUP BY 1, 2),
         |piv AS (
         |  SELECT doc_id,
         |    MAX(CASE WHEN cls = 0 THEN sc END) AS s0,
         |    MAX(CASE WHEN cls = 1 THEN sc END) AS s1,
         |    MAX(CASE WHEN cls = 2 THEN sc END) AS s2
         |  FROM lin GROUP BY doc_id)
         |SELECT doc_id, CAST(s0 AS BIGINT) AS s0, CAST(s1 AS BIGINT) AS s1,
         |  CAST(s2 AS BIGINT) AS s2,
         |  CAST(CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
         |            WHEN s1 >= s2 THEN 1 ELSE 2 END AS BIGINT) AS pred
         |FROM piv ORDER BY doc_id""".stripMargin

  val oracle = Map(
    "q132_nn_conv" ->
      convSql("SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32"),

    // Same network, weights round-tripped through the checkpoint.
    "q223_checkpoint_infer" ->
      convSql("SELECT doc_id FROM documents WHERE doc_id % 7 = 3 ORDER BY doc_id LIMIT 24"),


    "q134_nn_deep" ->
      s"""WITH docs AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 32),
         |grid AS (
         |  SELECT d.doc_id, o.range AS o, oy.range AS oy, ox.range AS ox,
         |         ky.range AS ky, kx.range AS kx,
         |         oy.range*2 - 2 + ky.range*2 AS iy,
         |         ox.range*2 - 2 + kx.range*2 AS ix
         |  FROM docs d, range(2) o, range(4) oy, range(4) ox,
         |       range(3) ky, range(3) kx),
         |conv AS (
         |  SELECT doc_id, o, oy, ox,
         |    SUM(CASE WHEN iy BETWEEN 0 AND 7 AND ix BETWEEN 0 AND 7 THEN
         |      ((doc_id*2654435761 + (o*64 + iy*8 + ix)*40503 + 97) % 251)
         |        * ((o*9 + ky*3 + kx)*5 % 7 - 3)
         |      ELSE 0 END) + (o*2 - 1) AS cv
         |  FROM grid GROUP BY 1, 2, 3, 4),
         |lin AS (
         |  SELECT p.doc_id, c.range AS cls,
         |    SUM(GREATEST(p.cv, 0) * ((c.range*32 + (p.o*16 + p.oy*4 + p.ox))*3 % 5 - 2))
         |      + c.range AS t
         |  FROM conv p, range(2) c
         |  GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(MAX(CASE WHEN cls = 0 THEN t END) AS BIGINT) AS t0,
         |  CAST(MAX(CASE WHEN cls = 1 THEN t END) AS BIGINT) AS t1
         |FROM lin GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The relational recomputation of the q221 composition. mx = the
    // max the shifted trunk window carries to the deep 1×1 sources
    // (rows 2..31 × cols 1..31 of the raster — the vgg.2/vgg.7 taps
    // clip row 0–1 / col 0); the CASE ladder is the integer-exact
    // gate + score-order + double-NMS decision tree derived in the
    // Spark-side scaladoc (S3fdAuditStore: confidence gates at M≥128
    // for scale 128, M≥132 for 512, M≥133 for 256, score-order flip
    // at M=135.5 — so on integer M the ladder boundaries are
    // 128/132/136, survivor sets {128}, {128,512}, {256}); the boxes
    // are the priors themselves (loc ≡ 0 ⇒ decode is exact).
    "q221_s3fd_forward" ->
      s"""WITH docs AS (
         |  SELECT c_custkey AS doc FROM customer ORDER BY c_custkey LIMIT 16),
         |m AS (
         |  SELECT d.doc,
         |    MAX(CASE WHEN y.range*32 + x.range = (d.doc*733) % 1024
         |      THEN 128 + (d.doc*7) % 16
         |      ELSE ((y.range*32 + x.range)*7) % 50 END) AS mx
         |  FROM docs d, range(2, 32) y, range(1, 32) x
         |  GROUP BY 1),
         |kept AS (
         |  SELECT doc, unnest(CASE
         |    WHEN mx >= 136 THEN [256]
         |    WHEN mx >= 132 THEN [128, 512]
         |    WHEN mx >= 128 THEN [128]
         |    ELSE [] END) AS ms
         |  FROM m),
         |geo AS (
         |  SELECT * FROM (VALUES
         |    (128, CAST(0.5 AS DOUBLE), CAST(4.0 AS DOUBLE)),
         |    (256, CAST(1.0 AS DOUBLE), CAST(8.0 AS DOUBLE)),
         |    (512, CAST(2.0 AS DOUBLE), CAST(16.0 AS DOUBLE))) g(ms, cx, w))
         |SELECT k.doc AS doc_id, CAST(k.ms AS BIGINT) AS scale_px,
         |  (g.cx - g.w/2) * 32 AS x1, (g.cx - g.w/2) * 32 AS y1,
         |  ((g.cx - g.w/2) + g.w) * 32 AS x2, ((g.cx - g.w/2) + g.w) * 32 AS y2
         |FROM kept k JOIN geo g ON g.ms = k.ms
         |ORDER BY doc_id, scale_px""".stripMargin,

    // q227: depthwise conv as a per-channel tap sum (weights indexed
    // c*3+k — the grouped layout), PReLU as the v>=0 CASE with alpha
    // 2, pointwise mix as a channel join-sum.
    "q227_nn_conv1d" ->
      s"""WITH docs AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 3 = 2
         |  ORDER BY doc_id LIMIT 16),
         |dw AS (
         |  SELECT d.doc_id, c.range AS c, t.range AS t,
         |    SUM(CASE WHEN t.range-1+k.range BETWEEN 0 AND 15 THEN
         |      (((d.doc_id*2654435761
         |         + (c.range*16 + t.range-1+k.range)*40503 + 97) % 251) - 125)
         |      * ((c.range*3 + k.range)*7 % 5 - 2)
         |      ELSE 0 END) + (c.range % 3 - 1) AS v
         |  FROM docs d, range(4) c, range(16) t, range(3) k
         |  GROUP BY d.doc_id, c.range, t.range),
         |pr AS (
         |  SELECT doc_id, c, t, CASE WHEN v >= 0 THEN v ELSE 2*v END AS v
         |  FROM dw),
         |pw AS (
         |  SELECT p.doc_id, o.range AS o, p.t,
         |    SUM(p.v * ((o.range*4 + p.c)*11 % 7 - 3)) + (o.range - 1) AS v
         |  FROM pr p, range(2) o
         |  GROUP BY p.doc_id, o.range, p.t)
         |SELECT doc_id, CAST(o AS BIGINT) AS o, CAST(t AS BIGINT) AS t,
         |  CAST(v AS BIGINT) AS v
         |FROM pw ORDER BY doc_id, o, t""".stripMargin,

    // q225: conv cell (o,cd,cy,cx) = Σ taps over the padded voxel
    // grid; relu; pool max over the (1,3,3)/(1,2,2)/(0,1,1) window
    // with out-of-bounds cells EXCLUDED (PyTorch pads pooling with
    // −inf, not 0 — the BETWEEN join reproduces exactly that).
    "q225_nn_conv3d" ->
      s"""WITH docs AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 5 = 1
         |  ORDER BY doc_id LIMIT 16),
         |conv AS (
         |  SELECT d.doc_id, o.range AS o, cd.range AS cd,
         |         cy.range AS cy, cx.range AS cx,
         |    SUM(CASE WHEN cd.range-1+kd.range BETWEEN 0 AND 3
         |          AND cy.range*2-1+ky.range BETWEEN 0 AND 7
         |          AND cx.range*2-1+kx.range BETWEEN 0 AND 7 THEN
         |      ((d.doc_id*2654435761 +
         |        ((cd.range-1+kd.range)*64 + (cy.range*2-1+ky.range)*8
         |          + (cx.range*2-1+kx.range))*40503 + 97) % 251)
         |      * ((o.range*27 + kd.range*9 + ky.range*3 + kx.range)*7 % 5 - 2)
         |      ELSE 0 END) + (o.range*2 - 1) AS cv
         |  FROM docs d, range(2) o, range(4) cd, range(4) cy, range(4) cx,
         |       range(3) kd, range(3) ky, range(3) kx
         |  GROUP BY d.doc_id, o.range, cd.range, cy.range, cx.range),
         |pool AS (
         |  SELECT c.doc_id, c.o, c.cd AS d, py.range AS py, px.range AS px,
         |    MAX(GREATEST(c.cv, 0)) AS v
         |  FROM conv c, range(2) py, range(2) px
         |  WHERE c.cy BETWEEN py.range*2 - 1 AND py.range*2 + 1
         |    AND c.cx BETWEEN px.range*2 - 1 AND px.range*2 + 1
         |  GROUP BY c.doc_id, c.o, c.cd, py.range, px.range)
         |SELECT doc_id, CAST(o AS BIGINT) AS o, CAST(d AS BIGINT) AS d,
         |  CAST(py AS BIGINT) AS y, CAST(px AS BIGINT) AS x,
         |  CAST(v AS BIGINT) AS v
         |FROM pool ORDER BY doc_id, o, d, y, x""".stripMargin,

    // q222: tokens = floor(32·embedding[0..15]) over vec_id 0..63 in
    // 8-token sequences; Q/K projections as join-sums over the SAME
    // closed-form in-proj formulas (K rows offset by d=16 — the packed
    // layout); 2·score = Σ_head-dims qv·kv; argmax per (seq, head,
    // qpos) with the lowest-kpos tie-break attentionScores' strict->
    // scan implements.
    "q222_attention_align" ->
      s"""WITH tok AS (
         |  SELECT vec_id // 8 AS seq, vec_id % 8 AS pos, i.range AS e,
         |    CAST(floor(CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) * 32)
         |      AS BIGINT) AS xv
         |  FROM embeddings, range(16) i WHERE vec_id < 64),
         |qp AS (
         |  SELECT t.seq, t.pos, r.range AS r,
         |    SUM(t.xv * ((r.range*13 + t.e*7) % 9 - 4)) + (r.range % 5 - 2) AS qv
         |  FROM tok t, range(16) r GROUP BY t.seq, t.pos, r.range),
         |kp AS (
         |  SELECT t.seq, t.pos, r.range - 16 AS r,
         |    SUM(t.xv * ((r.range*13 + t.e*7) % 9 - 4)) + (r.range % 5 - 2) AS kv
         |  FROM tok t, range(16, 32) r GROUP BY t.seq, t.pos, r.range),
         |sc AS (
         |  SELECT q.seq, q.r // 4 AS head, q.pos AS qpos, k.pos AS kpos,
         |    SUM(q.qv * k.kv) AS s2
         |  FROM qp q JOIN kp k ON k.seq = q.seq AND k.r = q.r
         |  GROUP BY q.seq, q.r // 4, q.pos, k.pos),
         |best AS (
         |  SELECT seq, head, qpos, kpos, s2,
         |    row_number() OVER (PARTITION BY seq, head, qpos
         |      ORDER BY s2 DESC, kpos) AS rn
         |  FROM sc)
         |SELECT seq, CAST(head AS BIGINT) AS head, CAST(qpos AS BIGINT) AS qpos,
         |  CAST(kpos AS BIGINT) AS kpos, CAST(s2 AS BIGINT) AS s2
         |FROM best WHERE rn = 1 ORDER BY seq, head, qpos""".stripMargin,

    // q242: the effective composition in closed form. u_t from the
    // doc_id formula (exactly the MFCC cells the δ-tap audio stem
    // samples and halves); u* = saturated head-0 selection, ū = the
    // uniform heads' exact ¼-weighted mean; the 4-class norm1 input
    // row B_t; then the four LayerNorms replicated bit-for-bit:
    // list_reduce is a left fold of correctly-rounded double adds in
    // dim order — the same partial sums as Tensor.layerNorm's loops —
    // and /128.0, +1e-5, sqrt, 1.0/x, (x−μ)·inv·1.0+0.0 mirror the
    // JVM expression shapes operation for operation. The final score
    // is element 1 (dim 0) of the last norm — the lossAV face logit.
    "q242_talknet_forward" ->
      s"""WITH docs AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 17 = 4
         |  ORDER BY doc_id LIMIT 4),
         |u AS (
         |  SELECT d.doc_id, t.range AS t,
         |    CAST(1 + (d.doc_id*31 + t.range*61) % 89 AS DOUBLE) AS uv
         |  FROM docs d, range(2) t),
         |du AS (
         |  SELECT doc_id, max(uv) AS us, sum(uv) / 2.0 AS ub
         |  FROM u GROUP BY doc_id),
         |b AS (
         |  SELECT u.doc_id, u.t,
         |    list_transform(range(128), c -> CASE
         |      WHEN c = 0 THEN u.uv + d.us
         |      WHEN c < 16 THEN d.us
         |      WHEN c % 16 = 0 THEN u.uv + d.ub
         |      ELSE d.ub END) AS r
         |  FROM u JOIN du d USING (doc_id)),
         |m1 AS (SELECT doc_id, t, r,
         |  list_reduce(r, (x, y) -> x + y) / 128.0 AS mu FROM b),
         |i1 AS (SELECT doc_id, t, r, mu,
         |  1.0 / sqrt(list_reduce(list_transform(r, x -> (x - mu) * (x - mu)),
         |    (x, y) -> x + y) / 128.0 + 1e-5) AS iv FROM m1),
         |l1 AS (SELECT doc_id, t,
         |  list_transform(r, x -> (x - mu) * iv * 1.0 + 0.0) AS r FROM i1),
         |m2 AS (SELECT doc_id, t, r,
         |  list_reduce(r, (x, y) -> x + y) / 128.0 AS mu FROM l1),
         |i2 AS (SELECT doc_id, t, r, mu,
         |  1.0 / sqrt(list_reduce(list_transform(r, x -> (x - mu) * (x - mu)),
         |    (x, y) -> x + y) / 128.0 + 1e-5) AS iv FROM m2),
         |l2 AS (SELECT doc_id, t,
         |  list_concat(list_transform(r, x -> (x - mu) * iv * 1.0 + 0.0),
         |    list_transform(range(128), c -> 0.0)) AS r FROM i2),
         |m3 AS (SELECT doc_id, t, r,
         |  list_reduce(r, (x, y) -> x + y) / 256.0 AS mu FROM l2),
         |i3 AS (SELECT doc_id, t, r, mu,
         |  1.0 / sqrt(list_reduce(list_transform(r, x -> (x - mu) * (x - mu)),
         |    (x, y) -> x + y) / 256.0 + 1e-5) AS iv FROM m3),
         |l3 AS (SELECT doc_id, t,
         |  list_transform(r, x -> (x - mu) * iv * 1.0 + 0.0) AS r FROM i3),
         |m4 AS (SELECT doc_id, t, r,
         |  list_reduce(r, (x, y) -> x + y) / 256.0 AS mu FROM l3),
         |i4 AS (SELECT doc_id, t, r, mu,
         |  1.0 / sqrt(list_reduce(list_transform(r, x -> (x - mu) * (x - mu)),
         |    (x, y) -> x + y) / 256.0 + 1e-5) AS iv FROM m4)
         |SELECT doc_id, CAST(t AS BIGINT) AS frame,
         |  (r[1] - mu) * iv * 1.0 + 0.0 AS score
         |FROM i4 ORDER BY doc_id, frame""".stripMargin,

    "q133_nn_mlp" ->
      s"""WITH qi AS (
         |  SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id, CAST(i AS BIGINT) AS i,
         |    CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * 32) AS BIGINT) AS qv
         |  FROM qi),
         |h AS (
         |  SELECT q.vec_id, j.range AS j,
         |    GREATEST(SUM(q.qv * ((j.range*131 + q.i)*13 % 9 - 4))
         |      + (j.range % 5 - 2), 0) AS hv
         |  FROM q, range(8) j GROUP BY 1, 2),
         |o AS (
         |  SELECT h.vec_id, c.range AS cls,
         |    SUM(h.hv * ((c.range*67 + h.j)*17 % 11 - 5)) + (c.range % 3 - 1) AS sc
         |  FROM h, range(4) c GROUP BY 1, 2),
         |piv AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN cls = 0 THEN sc END) AS s0,
         |    MAX(CASE WHEN cls = 1 THEN sc END) AS s1,
         |    MAX(CASE WHEN cls = 2 THEN sc END) AS s2,
         |    MAX(CASE WHEN cls = 3 THEN sc END) AS s3
         |  FROM o GROUP BY vec_id)
         |SELECT vec_id, CAST(s0 AS BIGINT) AS s0, CAST(s1 AS BIGINT) AS s1,
         |  CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3,
         |  CAST(CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
         |            WHEN s1 >= s2 AND s1 >= s3 THEN 1
         |            WHEN s2 >= s3 THEN 2 ELSE 3 END AS BIGINT) AS pred
         |FROM piv ORDER BY vec_id""".stripMargin,
  )
}
