package graft

import graft.pipeline.BatchPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end DAG: frames → scenes → detections → tracks → geometry →
  * ensemble scores → segments → summary, with stage checkpoints. */
class PipelineSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    // two videos; video 1 has a hard content cut at frame 100
    (for {
      v <- Seq(1L, 2L)
      f <- 0 until 200
    } yield (v, f, if (v == 1 && f >= 100) 120.0 else 10.0))
      .toDF("video_id", "frame", "content")
  }

  test("full pipeline produces scenes, tracks, scores, segments, summary") {
    val r = BatchPipeline.run(spark, frames)
    // video 1: cut at 100 → 2 scenes; video 2: fallback single scene
    val sc = r.scenes.groupBy("video_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(sc === Map(1L -> 2L, 2L -> 1L))
    assert(r.detections.count() > 0)
    val trackedScenes = r.tracks.select("video_id", "scene_id").distinct().count()
    assert(trackedScenes === 3) // one drifting face per scene
    // every track-frame scored, scores are bround(x, 1)
    assert(r.scores.count() === r.tracks.count())
    val badRound = r.scores.filter(
      abs(col("score") * 10 - round(col("score") * 10)) > 1e-9).count()
    assert(badRound === 0)
    assert(r.segments.count() > 0)
    val sm = r.summary.collect()
    assert(sm.nonEmpty && sm.forall(_.getAs[Long]("n_segments") > 0))
  }

  test("stage checkpoints write the reference's pckl-contract names, " +
    "hive-partitioned by video_id with working pruning") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    BatchPipeline.run(spark, frames, checkpointDir = Some(dir))
    for (stage <- Seq("scene", "faces", "tracks", "scores")) {
      assert(spark.read.parquet(s"$dir/$stage").count() > 0, s"stage $stage empty")
      assert(new java.io.File(s"$dir/$stage").listFiles()
        .exists(_.getName.startsWith("video_id=")), s"stage $stage not partitioned")
    }
    // a per-video read (the reference's resume/debug unit) prunes to
    // one partition directory
    val one = spark.read.parquet(s"$dir/scores")
      .filter(org.apache.spark.sql.functions.col("video_id") === 1L)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(video_id"), scan)
  }

  test("ensemble runs the batched kernel: mean over the DISTINCT duration set, " +
    "batch-aware stub terms, numpy-rint rounding") {
    import graft.operators.DurationEnsemble
    // track 0 of video 1 covers frames 0..99 (scene 1) → track-local
    // index == frame. Expected score of local frame 7: mean over
    // d∈{1..6} of the stub at (d, batch i = 7 div 25d), numpy-rounded.
    val expected = {
      var s = 0.0
      DurationEnsemble.DurationSet.foreach { d =>
        val i = 7 / (25 * d)
        s += math.sin((7 + 1L * 13.0 + 0L * 7.0) / 10.0) * 0.8 +
          (d - 3.5) * 0.01 + i * 0.002
      }
      Math.rint(s / 6 * 10) / 10
    }
    val r = BatchPipeline.run(spark, frames)
    val got = r.scores.filter(col("video_id") === 1 && col("track_id") === 0 && col("frame") === 7)
      .select("score").head().getDouble(0)
    assert(got === expected)
  }

  test("smoothScoresQuirk excludes the final score at the tail (reference :350)") {
    import spark.implicits._
    val scores = Seq(0.0, 0.0, 0.0, 0.0, 10.0).zipWithIndex
      .map { case (s, i) => (1L, 0L, i, s) }.toDF("video_id", "track_id", "frame", "score")
    val sm = BatchPipeline.smoothScoresQuirk(spark, scores)
      .orderBy("frame").select("smoothed").collect().map(_.getDouble(0))
    // n=5; i=4: slice [2, min(7,4)) = [2,4) = {0,0} → 0.0 (10 excluded!)
    assert(sm(4) === 0.0)
    // i=2: slice [0, min(5,4)) = [0,4) = {0,0,0,0} → 0.0 (10 excluded)
    assert(sm(2) === 0.0)
    // i=1: slice [0,4) → 0.0
    assert(sm(0) === 0.0)
  }
}
