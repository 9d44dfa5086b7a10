package graft

/** Verdict item: the roundtrip queries (q46/q54/q55/q63) used to
  * scratch via Files.createTempDirectory — local-FS-only on a real
  * cluster. They now route through Q.scratchDir, which honors the
  * `graft.scratch.dir` conf (set it to a shared filesystem on a
  * cluster). This pins: the override is respected (files land under
  * it) and the query results are unchanged. */
class ScratchDirSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("roundtrip queries honor graft.scratch.dir and stay correct") {
    val baseline = SparkEntry.queries("q46_trial_roundtrip")(spark, sf).collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_root")
    spark.conf.set("graft.scratch.dir", root.toString)
    try {
      val overridden = SparkEntry.queries("q46_trial_roundtrip")(spark, sf).collect().toSeq
      assert(overridden === baseline)
      val children = {
        val s = java.nio.file.Files.list(root)
        try { val b = Seq.newBuilder[String]; s.forEach(p => b += p.getFileName.toString); b.result() }
        finally s.close()
      }
      assert(children.exists(_.startsWith("graft_trial")), children.toString)
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("manifest ingest roundtrip works under an overridden scratch root") {
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_root2")
    spark.conf.set("graft.scratch.dir", root.toString)
    try {
      val rows = SparkEntry.queries("q63_manifest_ingest")(spark, sf).collect()
      assert(rows.length === 5) // labels c0..c4
      assert(rows.map(_.getLong(1)).sum === 1500L) // sf0.001 orders count
    } finally spark.conf.unset("graft.scratch.dir")
  }
}
