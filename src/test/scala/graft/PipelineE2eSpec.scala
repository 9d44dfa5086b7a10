package graft

import graft.pipeline.BatchPipeline
import graft.sinks.MediaSinks
import graft.sources.v2.FrameSource
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** The full story wired together: the V2 frame scan (with its decode
  * kernel) feeds the pipeline DAG, and the pipeline's speaking
  * segments flow into the distributed segment file sink — source →
  * process → sink, all on the executors. */
class PipelineE2eSpec extends SparkSpec {

  test("FrameSource frames drive the pipeline; its segments land in the file sink") {
    // two 8 s videos at 25 fps = 200 frames; content steps +80 every
    // 100 frames (a scene cut, > the 27.0 threshold) with sub-
    // threshold checksum jitter riding on top
    val frames = spark.read.format(classOf[FrameSource].getName)
      .option("videos", "1:8.0;2:8.0").option("fps", "25").load()
      .select(substring(col("video_name"), 2, 5).cast("long").as("video_id"),
        col("frame").cast("int"),
        (floor(col("frame") / 100) * 80.0 + 10.0 +
          (col("checksum") % 2).cast("double") * 0.1).as("content"))
    val r = BatchPipeline.run(spark, frames)
    val nSeg = r.segments.count()
    assert(nSeg > 0)
    assert(r.scenes.count() === 4) // 2 scenes per video

    val out = Files.createTempDirectory("graft_e2e").toString
    val manifest = MediaSinks.cutSegments(spark, r.segments, out).collect()
    assert(manifest.length === 2 * nSeg) // avi + wav per segment
    manifest.foreach { m =>
      assert(Files.size(Paths.get(m.getString(3))) === m.getLong(4), m.getString(3))
    }
  }
}
