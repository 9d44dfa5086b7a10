package graft

import graft.sources.v2.ManifestSource
import org.apache.spark.sql.functions._

/** The HF-style streaming-manifest V2 reader (batchProcessVideos.py:
  * 111–124 ingestion mode): JSONL sample parsing incl. missing
  * fields, one partition per shard, column pruning reaching the
  * parser, and limit pushdown (streaming take(n)) capping reads per
  * shard. */
class ManifestSpec extends SparkSpec {

  private def fmt = classOf[ManifestSource].getName

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mani")
    java.nio.file.Files.write(dir.resolve("shard0.jsonl"), java.util.Arrays.asList(
      """{"video":{"path":"data/clip_0001.mp4","bytes":111},"label":"a"}""",
      "",
      """{"video":{"path":"data/clip_0002.mp4","bytes":222},"label":"b"}""",
      """{"label":"no_video"}"""))
    java.nio.file.Files.write(dir.resolve("shard1.jsonl"), java.util.Arrays.asList(
      """{"video":{"path":"nested/dir/clip_0003.webm","bytes":333}}"""))
    dir.toString
  }

  test("parses samples, tolerates missing fields, one partition per shard") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
    assert(df.rdd.getNumPartitions === 2)
    val rows = df.orderBy("shard", "idx").collect()
    assert(rows.length === 4)
    // blank line skipped: second sample of shard0 has idx 1
    assert(rows(1).getString(2) === "data/clip_0002.mp4" && rows(1).getLong(1) === 1L)
    // sample without video → null path/bytes; sample without label → null label
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3) && rows(2).getString(4) === "no_video")
    assert(rows(3).isNullAt(4) && rows(3).getLong(3) === 333L)
  }

  test("column pruning reaches the parser (ReadSchema shrinks)") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
      .select("video_bytes")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=video_bytes"), plan)
    assert(df.collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).sorted
      === Array(111L, 222L, 333L))
  }

  test("limit pushdown caps per-shard reads (streaming take(n))") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load().limit(1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit=1"), plan)
    assert(df.collect().length === 1)
    // cap is per shard: shard0's reader must not see past its first sample
    val capped = spark.read.format(fmt).option("path", writeFixture()).load().limit(3)
    assert(capped.collect().length === 3)
  }

  test("shard/idx locate samples like enumerate(ds) per shard") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
    val byShard = df.collect().groupBy(_.getString(0))
    assert(byShard("shard0.jsonl").map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L))
    assert(byShard("shard1.jsonl").map(_.getLong(1)).toSeq === Seq(0L))
  }
}
