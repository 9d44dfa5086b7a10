package graft

import org.apache.spark.sql.DataFrame

/** Regression gate for the two sequential-kernel queries (q42 greedy
  * tracker, q44 e2e pipeline). Since round 6 both ALSO run under the
  * DuckDB oracle gate on constructed single-face-per-frame inputs
  * (the greedy pass provably reduces to gaps-and-islands there — see
  * DomainQueries); this spec keeps pinning the full sf0.01 output
  * verbatim as a second, engine-independent fingerprint, and
  * TrackerSpec/PipelineSpec pin the adversarial-input quirks the
  * constructed inputs cannot reach.
  *
  * If a change is INTENTIONAL, re-derive the fingerprint (the failure
  * message prints it) and update the constant in the same commit that
  * explains why the output moved.
  */
class GoldenSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  /** Order-sensitive MD5 over the collected rows (queries are already
    * deterministically ordered on a unique key). Doubles via
    * Double.toString (shortest repr — stable across JVMs). */
  private def fingerprint(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    df.collect().foreach { row =>
      val line = row.toSeq.map {
        case null => "∅"
        case d: java.lang.Double => d.toString
        case f: java.lang.Float => f.toString
        case s: Seq[_] => s.mkString("[", ",", "]")
        case x => x.toString
      }.mkString("|")
      md.update((line + "\n").getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def check(name: String, expected: String): Unit = {
    val got = fingerprint(SparkEntry.queries(name)(spark, sf01))
    assert(got === expected,
      s"$name sf0.01 golden fingerprint drifted: got $got, pinned $expected")
  }

  test("q42_greedy_tracks sf0.01 output matches committed golden") {
    // Re-derived for the round-6 constructed segment input (the
    // INTENTIONAL drift that gave q42 a DuckDB oracle).
    check("q42_greedy_tracks", "ca8f9163c178062ce45cedbe11039a07")
  }

  test("q44_pipeline_e2e sf0.01 output matches committed golden") {
    // Re-derived when q44 switched to the oracle-parity
    // HashBatchScorer (the INTENTIONAL drift that gave q44 a DuckDB
    // oracle); the sin-based StubScorer stays pinned by PipelineSpec.
    check("q44_pipeline_e2e", "330c41aa2006707abe2432c66ddc81fd")
  }
}
