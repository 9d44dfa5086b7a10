package graft

import graft.streaming.FolderWatch
import org.apache.spark.sql.functions._

/** The folder-watch streaming driver: new frame shards arriving in a
  * watched directory flow through the whole batch pipeline; the
  * checkpoint makes a second pass process ONLY the new arrivals. */
class FolderWatchSpec extends SparkSpec {

  private def frames(vidRange: Range) = {
    import spark.implicits._
    (for (v <- vidRange; f <- 0 until 300)
      yield (v.toLong, f, math.floor(f / 100.0) * 80.0 + 10.0))
      .toDF("video_id", "frame", "content")
  }

  test("processes arrivals incrementally across two passes") {
    val base = java.nio.file.Files.createTempDirectory("graft_watch").toString
    val (watch, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")

    frames(0 to 1).write.mode("overwrite").parquet(watch)
    val segs1 = FolderWatch.processAvailable(spark, watch, out, ckpt)
    val n1 = segs1.count()
    assert(n1 > 0, "first pass produced no segments")
    assert(segs1.select("video_id").distinct().count() === 2)

    // second arrival: two more videos; only they are processed
    frames(2 to 3).write.mode("append").parquet(watch)
    val segs2 = FolderWatch.processAvailable(spark, watch, out, ckpt)
    assert(segs2.select("video_id").distinct().count() === 4)
    // pass-2 batch ids contain only the new videos
    val maxBatch1 = segs1.agg(max("batch_id")).first().getLong(0)
    val newRows = segs2.filter(col("batch_id") > maxBatch1)
    assert(newRows.select("video_id").distinct().collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("manifest shards stream incrementally (the HF streaming=True mode)") {
    val base = java.nio.file.Files.createTempDirectory("graft_maniwatch").toString
    val (watch, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(watch))

    def shard(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(watch, name),
        String.join("\n", lines: _*).getBytes("UTF-8"))

    shard("shard0.jsonl", Seq(
      """{"video":{"path":"data/clip_0001.mp4","bytes":11},"label":"a"}""",
      """{"video":{"path":"data/clip_0002.mp4","bytes":22},"label":"b"}"""))
    val p1 = FolderWatch.processAvailableManifests(spark, watch, out, ckpt)
    assert(p1.count() === 2)
    assert(p1.select("video_name").collect().map(_.getString(0)).sorted.toSeq
      === Seq("clip_0001", "clip_0002"))

    // a later shard: only IT is parsed on the second pass
    shard("shard1.jsonl", Seq(
      """{"video":{"path":"nested/clip_0003.webm","bytes":33},"label":"a"}"""))
    val p2 = FolderWatch.processAvailableManifests(spark, watch, out, ckpt)
    assert(p2.count() === 3)
    val maxBatch1 = p1.agg(max("batch_id")).first().getLong(0)
    val fresh = p2.filter(col("batch_id") > maxBatch1).collect()
    assert(fresh.length === 1 && fresh.head.getAs[String]("video_name") === "clip_0003")
  }
}
