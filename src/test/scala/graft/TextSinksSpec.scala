package graft

import graft.sinks.TextSinks
import org.apache.spark.sql.functions._

/** The JSONL shard sink under test: exact line literals in doc_id
  * order, one file per shard even when a hash partition carries
  * several shards, and a manifest whose byte counts equal the real
  * file sizes. */
class TextSinksSpec extends SparkSpec {

  test("shards land as exact JSONL lines with a size-true manifest") {
    import spark.implicits._
    val rows = Seq(
      (0L, 4L, "en", 10L), (1L, 1L, "fr", 7L), (0L, 2L, "en", 3L),
      (1L, 9L, "de", 5L), (3L, 6L, "en", 2L)
    ).toDF("shard", "doc_id", "lang", "n_chars")
    val out = graft.queries.Q.scratchDir(spark, "textsinkspec")
    val manifest = TextSinks.writeJsonlShards(spark, rows, out)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(manifest.keySet == Set(0L, 1L, 3L))
    // shard 0: doc_id order, exact literals
    val s0 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/shard-0.jsonl"))
    assert(s0 ==
      "{\"doc_id\":2,\"lang\":\"en\",\"n_chars\":3,\"shard\":0}\n" +
      "{\"doc_id\":4,\"lang\":\"en\",\"n_chars\":10,\"shard\":0}\n")
    // manifest counts and bytes match the real files
    for ((sh, (path, n, b)) <- manifest) {
      val f = java.nio.file.Paths.get(path)
      assert(java.nio.file.Files.size(f) == b, s"shard $sh byte count")
      assert(java.nio.file.Files.readAllLines(f).size == n, s"shard $sh rows")
    }
    // empty shard 2 → no file
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/shard-2.jsonl")))
  }
}
