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
}
