package graft

import graft.nn.S3fdNet
import graft.queries.NnQueries
import org.scalatest.funsuite.AnyFunSuite

/** q221's full-network detect audit, pinned WITHOUT Spark or DuckDB:
  * the real S3fdNet forward under the delta-kernel AuditStore must
  * land on the closed-form decision tree the oracle SQL re-derives
  * (reference model/faceDetector/s3fd/nets.py:28–174 for the trunk,
  * box_utils.py + __init__.py:32–62 for the post chain).
  *
  * The taps in the store are deliberately off-center (vgg.2 shifts x,
  * vgg.7 shifts y), so these tests FAIL if conv kernel indexing is
  * transposed/reflected anywhere in the 15-conv trunk — the border
  * docs (hot pixel in clipped rows/cols) flip from detection to
  * empty.
  */
class S3fdFullDetectSpec extends AnyFunSuite {

  private lazy val net = new S3fdNet(NnQueries.S3fdAuditStore)

  private def detect(doc: Long) =
    S3fdNet.detectImage(net, NnQueries.q221Raster(doc), 32, 32, confTh = 0.8)

  /** The oracle's decision tree (scale_px survivor sets by window max). */
  private def expected(m: Int): Seq[Long] =
    if (m >= 136) Seq(256L)
    else if (m >= 132) Seq(128L, 512L)
    else if (m >= 128) Seq(128L)
    else Seq.empty

  test("deep-source value is the shifted-window max (trunk composition)") {
    // doc 1: hot pixel p0 = 733 → (y=22, x=29) interior, hot = 128+7
    assert(NnQueries.q221WindowMax(1L) == 135)
    // doc 7: p0 = 5131 % 1024 = 11 → row 0, clipped by the vgg.7 tap
    assert(NnQueries.q221WindowMax(7L) == 49)
    // doc 32: p0 = 928 → col 0, clipped by the vgg.2 tap
    assert(NnQueries.q221WindowMax(32L) == 49)
  }

  test("full forward + post chain matches the closed-form decision tree") {
    (1L to 32L).foreach { doc =>
      val m = NnQueries.q221WindowMax(doc)
      val got = detect(doc).map { case (x1, _, x2, _, _) => math.round(x2 - x1) }
      assert(got.sorted == expected(m).sorted,
        s"doc=$doc m=$m got=$got expected=${expected(m)}")
    }
  }

  test("boxes are the exact prior boxes (loc≡0 ⇒ decode exact)") {
    val perScale = Map(
      128L -> (-48.0, 80.0), 256L -> (-96.0, 160.0), 512L -> (-192.0, 320.0))
    (1L to 32L).foreach { doc =>
      detect(doc).foreach { case (x1, y1, x2, y2, _) =>
        val s = math.round(x2 - x1)
        val (lo, hi) = perScale(s)
        assert(x1 == lo && y1 == lo && x2 == hi && y2 == hi,
          s"doc=$doc scale=$s box=($x1,$y1,$x2,$y2)")
      }
    }
  }

  test("all three survivor sets and the empty set occur across the 32 docs") {
    val kinds = (1L to 32L).map(d => expected(NnQueries.q221WindowMax(d))).toSet
    assert(kinds.contains(Seq(128L)), "zone {128} missing")
    assert(kinds.contains(Seq(128L, 512L)), "zone {128,512} missing")
    assert(kinds.contains(Seq(256L)), "zone {256} missing")
    assert(kinds.contains(Seq.empty), "empty zone missing")
  }

  test("shallow priors are conf-masked by the max-out bias (no extra rows)") {
    // every detection is one of the three deep scales — a shallow
    // prior leaking through would surface a 16-px box
    (1L to 8L).foreach { doc =>
      detect(doc).foreach { case (x1, _, x2, _, _) =>
        assert(Set(128L, 256L, 512L).contains(math.round(x2 - x1)))
      }
    }
  }
}
