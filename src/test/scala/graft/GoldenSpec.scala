package graft

import org.apache.spark.sql.DataFrame

/** Regression gate for the two permanently rows-only queries (q42
  * greedy tracker, q44 e2e pipeline): their outputs are sequential-
  * kernel results with no SQL oracle, so we pin committed MD5
  * fingerprints of the full sf0.01 output instead. Any semantic drift
  * in the tracker/pipeline kernels fails here even though the DuckDB
  * gate can't see it. TrackerSpec/PipelineSpec pin the semantics on
  * hand fixtures; this pins the at-scale output verbatim.
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
    check("q42_greedy_tracks", "5419c778d0b22a12c88c167f7ac3034d")
  }

  test("q44_pipeline_e2e sf0.01 output matches committed golden") {
    // Re-derived when scoring moved to the batched DurationEnsemble
    // kernel (track-local frame indexing + per-batch stub term): the
    // INTENTIONAL drift from the old per-row-sum scorer. Segment
    // boundaries shift where scores cross the threshold differently.
    check("q44_pipeline_e2e", "09dbfa1c7af16085cc61be8ce1afcbdc")
  }
}
