package graft

import graft.nn._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q242 construction (nn/TalkNetAudit.scala): the REAL
  * TalkNetModel.score forward on the audit weights must equal the
  * independently derived closed form BIT FOR BIT, the saturation /
  * identity-norm exactness tricks must hold on this JVM, and the
  * DoubleStorage checkpoint roundtrip must be lossless. */
class TalkNetForwardAuditSpec extends AnyFunSuite {

  test("double-exactness preconditions hold on this JVM") {
    // bn identity: fl(fl(1−eps)+eps) == 1.0 for both eps the model uses
    assert((1.0 - 1e-5) + 1e-5 == 1.0)
    assert((1.0 - 1e-3) + 1e-3 == 1.0)
    // SE saturation: sigmoid(40) is an exact 1.0
    assert(1.0 / (1.0 + math.exp(-40.0)) == 1.0)
    // softmax saturation: the winner's normalizer stays exactly 1.0
    // at the design margin (three losers at the minimum gap 60)
    assert(1.0 + 3.0 * math.exp(-60.0) == 1.0)
    // loser context contributions round away against any u ≥ 1
    assert(1.0 + math.exp(-60.0) * 90.0 == 1.0)
  }

  test("u values are distinct within every doc (tie-free argmax)") {
    for (doc <- 0L until 500L) {
      val u = (0 until TalkNetAudit.T).map(TalkNetAudit.uVal(doc, _))
      assert(u.distinct.size == TalkNetAudit.T, s"doc $doc: $u")
    }
  }

  test("full forward matches the closed form bit for bit (direct store)") {
    // docs 4 and 38: u₀<u₁ for one and u₀>u₁ for the other, so both
    // saturated-argmax positions are exercised
    for (doc <- Seq(4L, 38L)) {
      val m = new TalkNetModel(TalkNetAudit.Store)
      val got = m.score(TalkNetAudit.mfccFor(doc), TalkNetAudit.frames, 112, 112)
      val exp = TalkNetAudit.expectedScores(doc)
      assert(got.length == TalkNetAudit.T)
      assert(java.util.Arrays.equals(got, exp),
        s"doc $doc: got ${got.mkString(",")} exp ${exp.mkString(",")}")
    }
  }

  test("DoubleStorage checkpoint roundtrip is bit-lossless and complete") {
    val tmp = java.nio.file.Files.createTempFile("tnet_audit", ".pth")
    try {
      java.nio.file.Files.write(tmp, TalkNetAudit.checkpointBytes)
      val entries = TorchCheckpoint.load(tmp.toString)
      assert(entries.nonEmpty)
      // every parsed tensor equals the store's values exactly —
      // including fl(1−1e-5)/fl(1−1e-3), which float32 would destroy
      entries.foreach { e =>
        val want = TalkNetAudit.Store.tensor(e.name, e.shape: _*).data
        assert(java.util.Arrays.equals(e.data, want), s"${e.name} differs")
      }
      // the inventory covers the norm vars whose exactness carries
      // the audio signal
      val names = entries.map(_.name).toSet
      assert(names.contains("audioEncoder.bn1.running_var"))
      assert(names.contains("crossA2V.self_attn.in_proj_weight"))
      assert(names.contains("lossAV.FC.weight"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("forward from the parsed checkpoint equals the direct-store forward") {
    val tmp = java.nio.file.Files.createTempFile("tnet_audit2", ".pth")
    try {
      java.nio.file.Files.write(tmp, TalkNetAudit.checkpointBytes)
      val ws = MapWeights(
        TorchCheckpoint.load(tmp.toString).map(e => e.name -> e.data).toMap,
        TalkNetAudit.NoFallback)
      val doc = 38L
      val viaCkpt = new TalkNetModel(ws)
        .score(TalkNetAudit.mfccFor(doc), TalkNetAudit.frames, 112, 112)
      val exp = TalkNetAudit.expectedScores(doc)
      assert(java.util.Arrays.equals(viaCkpt, exp))
    } finally java.nio.file.Files.delete(tmp)
  }
}
