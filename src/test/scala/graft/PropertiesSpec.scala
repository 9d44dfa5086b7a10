package graft

import graft.functions.Mfcc
import graft.operators.{Eval, SpeakingSegments, TrackGeometry, Tracker}
import graft.sources.Wav
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style invariant tests (SURVEY §5): deterministic seeded
  * generation (no scalatest↔scalacheck bridge in the offline cache),
  * many cases per property. Spark-backed properties batch all cases
  * into ONE job so the suite stays fast.
  */
class PropertiesSpec extends SparkSpec {

  private def rnd = new Random(42)

  test("IoU: symmetric, bounded to [0,1], identity = 1 (500 cases)") {
    val r = rnd
    for (_ <- 1 to 500) {
      def box() = {
        val x1 = r.nextDouble() * 100; val y1 = r.nextDouble() * 100
        Tracker.Det(0, x1, y1, x1 + r.nextDouble() * 50 + 1e-6, y1 + r.nextDouble() * 50 + 1e-6)
      }
      val (a, b) = (box(), box())
      val ab = Tracker.iou(a, b); val ba = Tracker.iou(b, a)
      assert(ab === ba)
      assert(ab >= 0.0 && ab <= 1.0 + 1e-12)
      assert(math.abs(Tracker.iou(a, a) - 1.0) < 1e-12)
    }
  }

  test("medfilt: length-preserving, interior of a constant array is the constant, " +
    "output values come from the zero-padded window (300 cases)") {
    val r = rnd
    for (_ <- 1 to 300) {
      val n = r.nextInt(60) + 1
      val xs = Array.fill(n)(r.nextDouble() * 10 - 5)
      val out = TrackGeometry.medfiltZeroPad(xs, 13)
      assert(out.length === n)
      val inWindow = xs.toSet + 0.0
      assert(out.forall(inWindow.contains))
      val c = r.nextDouble() * 10
      val const = TrackGeometry.medfiltZeroPad(Array.fill(n)(c), 13)
      for (i <- 6 until n - 6) assert(const(i) === c)
    }
  }

  test("interpolate: endpoints exact, dense frames, monotone in gaps (200 cases)") {
    val r = rnd
    for (_ <- 1 to 200) {
      val frames = (0 to r.nextInt(20) + 2).scanLeft(0)((f, _) => f + 1 + r.nextInt(4)).distinct
      val dets = frames.map(f => Tracker.Det(f, f * 2.0, f * 3.0, f * 2.0 + 10, f * 3.0 + 10))
      val dense = Tracker.interpolate(dets)
      assert(dense.map(_.frame) === (frames.head to frames.last))
      assert(dense.head === dets.head && dense.last === dets.last)
      // x1 = 2f is linear in frame, so interpolation must reproduce it
      dense.foreach(d => assert(math.abs(d.x1 - d.frame * 2.0) < 1e-9))
    }
  }

  test("WAV: encode∘decode = identity for any PCM16 payload (100 cases)") {
    val r = rnd
    for (_ <- 1 to 100) {
      val n = r.nextInt(2000)
      val rate = Seq(8000, 16000, 44100)(r.nextInt(3))
      val samples = Array.fill(n)(r.nextInt(65536).toShort)
      val back = Wav.decode(Wav.encode(rate, 1, samples))
      assert(back.sampleRate === rate && back.samples.toSeq === samples.toSeq)
    }
  }

  test("MFCC: frame count follows 1+ceil((n-400)/160), 13 ceps, all finite (60 cases)") {
    val r = rnd
    for (_ <- 1 to 60) {
      val n = r.nextInt(5000) + 1
      val sig = Array.fill(n)(r.nextDouble() * 2000 - 1000)
      val cep = Mfcc.mfcc(sig)
      val want = if (n <= 400) 1 else 1 + math.ceil((n - 400).toDouble / 160).toInt
      assert(cep.length === want, s"n=$n")
      assert(cep.forall(row => row.length == 13 && row.forall(v => !v.isNaN && !v.isInfinite)))
    }
  }

  test("segments: disjoint ordered runs, cover exactly the thresholded frames of " +
    "qualifying runs, length >= minFrames (40 random series, one Spark job)") {
    import spark.implicits._
    val r = rnd
    val series = for {
      vid <- 0L until 40L
      n = r.nextInt(120) + 5
      f <- 0 until n
    } yield (vid, 0L, f, if (r.nextBoolean()) r.nextDouble() * 50 + 1 else -r.nextDouble() * 50)
    val df = series.toDF("video_id", "track_id", "frame", "score")
    val segs = SpeakingSegments.extract(df, threshold = 0.0, minDurationS = 0.12, fps = 25)
      .collect().groupBy(_.getLong(0))
    val byVid = series.groupBy(_._1)
    val minFrames = (0.12 * 25).toInt // 3
    for ((vid, rows) <- byVid) {
      val mask = rows.sortBy(_._3).map(_._4 > 0.0)
      // reference transcription: end-exclusive runs incl. trailing, gate >= minFrames
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var start = -1
      for (i <- mask.indices) {
        if (mask(i) && start < 0) start = i
        if (!mask(i) && start >= 0) { runs += ((start, i)); start = -1 }
      }
      if (start >= 0) runs += ((start, mask.length))
      val want = runs.filter { case (s0, e0) => e0 - s0 >= minFrames }
      val got = segs.getOrElse(vid, Array.empty)
        .map(rr => (rr.getAs[Number]("start_frame").intValue, rr.getAs[Number]("end_frame").intValue))
        .sortBy(_._1).toSeq
      assert(got === want.toSeq, s"vid=$vid")
      // invariants: disjoint + ordered
      got.sliding(2).foreach { case Seq((_, e1), (s2, _)) => assert(e1 <= s2); case _ => }
    }
  }

  test("AP: invariant under input-order permutation; degenerate all-pos = 1 (one job per case, 4 cases)") {
    import spark.implicits._
    val r = rnd
    for (c <- 1 to 4) {
      val n = 40 + c * 17
      val rows = (0 until n).map(i => ("g", r.nextDouble(), if (r.nextBoolean()) 1 else 0, i))
      val perm = r.shuffle(rows)
      def ap(xs: Seq[(String, Double, Int, Int)]) =
        Eval.averagePrecision(xs.toDF("g", "score", "label", "tie"), "g", "score", "label", "tie")
          .select("ap").as[Double].head()
      val a1 = ap(rows); val a2 = ap(perm)
      assert(a1 === a2, "AP not order-invariant")
      assert(a1 >= 0.0 && a1 <= 1.0 + 1e-12)
    }
    val allPos = (0 until 30).map(i => ("g", i / 30.0, 1, i))
    import spark.implicits._
    val apAll = Eval.averagePrecision(allPos.toDF("g", "score", "label", "tie"),
      "g", "score", "label", "tie").select("ap").as[Double].head()
    assert(math.abs(apAll - 1.0) < 1e-12)
  }

  test("duration-ensemble geometry: per duration, batches tile the truncated " +
    "frames exactly once; audio bounds stay 4× video bounds (300 cases)") {
    import graft.operators.DurationEnsemble
    val r = rnd
    for (_ <- 1 to 300) {
      val nV = r.nextInt(400) + 1
      val nA = 4 * nV + r.nextInt(9) - 4 // jitter in [-4, 4]
      if (nA > 0) {
        val calls = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Int, Int)]()
        val rec = new DurationEnsemble.BatchScorer {
          override def scoreBatch(in: DurationEnsemble.EnsembleInput, d: Int, i: Int,
              aLo: Int, aHi: Int, vLo: Int, vHi: Int): Array[Double] = {
            calls += ((d, aLo, aHi, vLo, vHi)); new Array[Double](vHi - vLo)
          }
        }
        val out = DurationEnsemble.ensemble(
          DurationEnsemble.EnsembleInput(1, 0, nA, nV), rec)
        val nV2 = DurationEnsemble.truncatedVideoFrames(nA, nV)
        assert(out.length === nV2)
        calls.groupBy(_._1).foreach { case (d, cs) =>
          // batches tile [0, nV2) contiguously, no overlap, no gap
          val sorted = cs.sortBy(_._4)
          assert(sorted.head._4 === 0 && sorted.last._5 === nV2)
          sorted.sliding(2).filter(_.length == 2).foreach { w =>
            assert(w(0)._5 === w(1)._4, s"d=$d gap/overlap")
          }
          // audio slice is exactly 4× the video slice shape (clipped)
          cs.foreach { case (_, aLo, aHi, vLo, _) =>
            assert(aLo === vLo * 4 && aHi <= Math.round(
              DurationEnsemble.truncatedLength(nA, nV) * 100).toInt)
          }
        }
      }
    }
  }

  test("visual preprocessing: gray in [0,255], resize preserves value bounds, " +
    "crop side is 2·(c/2) with c = S/2 — the reference's int arithmetic (200 cases)") {
    import graft.operators.Visual
    val r = rnd
    for (_ <- 1 to 200) {
      val payload = Array.fill[Byte](r.nextInt(200) + 1)(r.nextInt(256).toByte)
      val side = (r.nextInt(6) + 2) * 2 // even 4..14
      val out = Visual.preprocess(payload, 16, 16, side)
      // int(c − c/2) : int(c + c/2) → width 2·(c/2); equals S/2 only
      // when c is even (224→112; 14→6, not 7)
      val c = side / 2
      val k = 2 * (c / 2)
      assert(out.length === k * k)
      assert(out.forall(v => v >= 0.0 && v <= 255.0))
      val gray = Visual.bgr2gray(Visual.decodeBgrStub(payload, 16, 16), 16, 16)
      val (lo, hi) = (gray.min, gray.max)
      // bilinear is a convex combination — never exceeds input bounds
      out.foreach(v => assert(v >= lo - 1e-9 && v <= hi + 1e-9))
    }
  }

  test("IVF nprobe results: dense ranks, cosine-descending (5 Spark cases)") {
    import graft.operators.Similarity
    val r = rnd
    for (_ <- 1 to 5) { // each case is a full Spark job — keep few
      val dim = r.nextInt(16) + 2
      val emb = (0 until 40).map(i =>
        (i.toLong, Array.fill(dim)(r.nextDouble().toFloat - 0.5f)))
      import spark.implicits._
      // nprobe=3 through the public path: every query's candidates span
      // at most 3 cells and each hit is ranked by exact cosine desc
      val df = emb.toDF("vec_id", "embedding")
      val res = Similarity.ivfTopK(spark, df, k = 5, codebookSize = 8,
        queryEvery = 10, nprobe = 3).collect()
      res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val ranks = rows.map(r2 => r2.getLong(1)).sorted.toSeq
        assert(ranks === (1L to ranks.length))
        val coss = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
        coss.sliding(2).foreach {
          case Array(a, b) => assert(a >= b - 1e-9)
          case _ =>
        }
      }
    }
  }
}
