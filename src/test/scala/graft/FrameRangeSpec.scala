package graft

import graft.sources.Media
import graft.sources.v2.FrameSource
import org.apache.spark.sql.functions._

/** The -ss/-to range-pushdown contract (demoTalkNet.py:486–507): a
  * frame-range predicate must reach the decode kernel as a
  * Media.DecodeRange, and out-of-range frames must never be
  * materialized. The pushed conjuncts are CONSUMED by the source (no
  * residual Spark filter), so a kernel that ignored the range would
  * leak extra rows into the results — the counts below would fail. */
class FrameRangeSpec extends SparkSpec {

  private def fmt = classOf[FrameSource].getName
  // three videos: 2 s, 4 s, 10 s at 25 fps → 50/100/250 frames
  private def frames = spark.read.format(fmt)
    .option("videos", "7:2.0;8:4.0;9:10.0").option("fps", "25").load()

  test("DecodeRange maps to the ffmpeg -ss/-to arguments") {
    val r = Media.DecodeRange(50, 149)
    assert(r.ssSec(25) === 2.0 && r.toSec(25) === 6.0)
  }

  test("stub decoder only generates the requested range (the seek contract)") {
    val v = Media.VideoMeta(7, "v00007", 10.0)
    val all = Media.StubFrameDecoder.decode(v, 25, None).toSeq
    assert(all.length === 250 && all.head.frame === 0L && all.last.frame === 249L)
    val ranged = Media.StubFrameDecoder.decode(v, 25, Some(Media.DecodeRange(60, 79))).toSeq
    assert(ranged.map(_.frame) === (60L to 79L))
    // range beyond the video clips to its end, like ffmpeg -to past EOF
    assert(Media.StubFrameDecoder.decode(v, 25, Some(Media.DecodeRange(240, 500))).length === 10)
  }

  test("frame-range predicate is pushed into the scan and consumed") {
    val df = frames.filter(col("frame") >= 60 && col("frame") < 80)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFrameRange=[60,79]"), plan)
    // no FilterExec node may remain ("RuntimeFilters:" in the scan
    // description is not one)
    assert(!plan.linesIterator.exists(_.trim.matches("""(\*\(\d+\) )?Filter .*""")),
      s"range should be consumed, not re-filtered:\n$plan")
    // v00007 ends at frame 49; v00008 (100) and v00009 (250) each
    // contribute frames 60..79 → 2 × 20 rows
    assert(df.count() === 40)
  }

  test("kernel rows outside the range never exist (no residual filter to hide them)") {
    val one = frames.filter(col("frame") === 0)
    assert(one.count() === 3) // frame 0 of each video
    val none = frames.filter(col("frame") >= 10 && col("frame") <= 5)
    assert(none.count() === 0) // contradictory range → no partitions planned
  }

  test("fps option drives frame count and t_sec (the -r normalize)") {
    val f10 = spark.read.format(fmt)
      .option("videos", "3:3.0").option("fps", "10").load()
    val rows = f10.orderBy("frame").collect()
    assert(rows.length === 30)
    assert(rows(7).getAs[Double]("t_sec") === 0.7)
  }

  test("decoder=avi: real AVI demux honors the same pushdown via idx1 seek") {
    import graft.operators.AviCodec
    // two real AVI files, 6 and 4 frames, distinct payloads per frame
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_src")
    def mk(key: Long, n: Int): Unit = {
      val fs = (0 until n).map(f =>
        Array.tabulate[Byte](32 + f)(k => ((key * 17 + f * 31 + k) % 251).toByte))
      java.nio.file.Files.write(dir.resolve(f"v$key%05d.avi"),
        AviCodec.encode(16, 16, 25, "MJPG", fs))
    }
    mk(7, 6); mk(8, 4)
    val df = spark.read.format(fmt)
      // durations oversize the real frame counts: the container wins
      .option("videos", "7:2.0;8:2.0").option("fps", "25")
      .option("decoder", s"avi:$dir").load()
    assert(df.count() === 10)
    val ranged = df.filter(col("frame") >= 2 && col("frame") <= 4)
      .select("video_name", "frame", "payload", "checksum")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Array[Byte]](2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(ranged.map(r => (r._1, r._2)).toSeq ===
      Seq(("v00007", 2L), ("v00007", 3L), ("v00007", 4L), ("v00008", 2L), ("v00008", 3L)))
    ranged.foreach { case (name, f, payload, cs) =>
      val key = name.drop(1).toLong
      val want = Array.tabulate[Byte](32 + f.toInt)(k => ((key * 17 + f * 31 + k) % 251).toByte)
      assert(payload.toSeq === want.toSeq, s"$name frame $f")
      assert(cs === Media.payloadChecksum(payload))
    }
  }

  test("column pruning reaches the reader; checksum matches the hash family") {
    val cs = frames.filter(col("frame") === 5).select("video_name", "checksum").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cs("v00007") === Media.frameChecksum(7, 5))
    assert(cs.size === 3)
    val plan = frames.select("video_name", "frame").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=video_name,frame"), plan)
  }
}
