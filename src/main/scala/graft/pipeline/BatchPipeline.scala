package graft.pipeline

import graft.operators.{DurationEnsemble, SceneDetect, SpeakingSegments, Tracker, TrackGeometry}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The whole reference pipeline as ONE Spark DAG — the Spark-native
  * `batchProcessVideos.py` + `demoTalkNet.py main()` (SURVEY §3.1–3.2):
  *
  *   frames ─ scene detect ─ detect faces ─ track ─ geometry ─ score
  *   (duration ensemble) ─ smooth ─ sessionize ─ segments + summary
  *
  * Where the reference crosses a process boundary per stage and per
  * video (subprocess + pickle), here every stage is a DataFrame
  * transform partitioned by video/scene — lineage replaces pickles and
  * stage checkpoints are optional parquet writes with the same names.
  *
  * The GPU/codec kernels (S3FD, TalkNet, ffmpeg) are pluggable traits;
  * the defaults are deterministic STUBS (weights aren't shipped in the
  * reference repo either — demoTalkNet.py:58–61 downloads them), so the
  * pipeline is testable end-to-end; swap in real kernels per executor
  * and nothing else changes.
  *
  * Reference quirks reproduced:
  *  - duration "multiset" {1,1,1,2,2,2,3,3,4,5,6} is a Python set ⇒
  *    SIX distinct durations {1..6} (demoTalkNet.py:234);
  *  - ensemble = ONE batched model call per (duration, batch) over
  *    tensor slice bounds (DurationEnsemble), mean over durations,
  *    then numpy.round(·, 1) = rint(x·10)/10 HALF_EVEN in double
  *    space (demoTalkNet.py:256–270);
  *  - visualization smoothing slice [max(i-2,0), min(i+3, n-1))
  *    EXCLUDES the final score for the last three frames
  *    (demoTalkNet.py:350).
  */
object BatchPipeline {

  /** Pluggable per-frame face detector (S3FD's seat). */
  trait FaceDetector extends Serializable {
    def detect(videoId: Long, frame: Int, content: Double): Seq[(Double, Double, Double, Double, Double)] // x1,y1,x2,y2,conf
  }

  /** TalkNet's seat is the BATCHED scorer contract — one model forward
    * per (duration, batch) over tensor slice bounds, not one call per
    * frame. See DurationEnsemble.BatchScorer. */
  type SpeakerScorer = DurationEnsemble.BatchScorer

  /** STUB detector: one slowly-drifting face per frame, conf from a
    * deterministic hash. Replace with the real model kernel. */
  object StubDetector extends FaceDetector {
    def detect(videoId: Long, frame: Int, content: Double): Seq[(Double, Double, Double, Double, Double)] = {
      val x = (frame % 200) / 10.0
      val conf = 0.90 + ((videoId * 31 + frame) % 10) / 100.0
      Seq((x, 10.0, x + 20.0, 25.0, conf))
    }
  }

  /** Pipeline-default stub model (see DurationEnsemble.StubBatchScorer). */
  val StubScorer: SpeakerScorer = DurationEnsemble.StubBatchScorer

  /** frames(video_id, frame, content) → detections with conf filter
    * (the reference's conf gate sits inside the detector call). */
  def detectFaces(spark: SparkSession, frames: DataFrame, detector: FaceDetector,
      confTh: Double = 0.9): DataFrame = {
    import spark.implicits._
    frames.select(col("video_id").cast("long"), col("frame").cast("int"),
        col("content").cast("double"))
      .as[(Long, Int, Double)]
      .mapPartitions { it =>
        // per-partition init point for the real model
        it.flatMap { case (v, f, c) =>
          detector.detect(v, f, c).zipWithIndex.collect {
            case ((x1, y1, x2, y2, conf), i) if conf > confTh => (v, f, i, x1, y1, x2, y2, conf)
          }
        }
      }
      .toDF("video_id", "frame", "det_idx", "x1", "y1", "x2", "y2", "conf")
  }

  /** Attach scene_id to detections: broadcast the (small) scene table
    * and range-join frame ∈ [start, end) — scenes per video are few,
    * so this is a broadcast range join, never a shuffle of detections. */
  def assignScenes(dets: DataFrame, scenes: DataFrame, minSceneLen: Int = 11): DataFrame = {
    val keptScenes = scenes
      .filter(col("end_frame") - col("start_frame") >= minSceneLen) // shot-length gate
      .select(col("video_id").as("s_vid"), col("scene_id"),
        col("start_frame"), col("end_frame"))
    dets.join(broadcast(keptScenes),
        col("video_id") === col("s_vid") &&
          col("frame") >= col("start_frame") && col("frame") < col("end_frame"))
      .drop("s_vid", "start_frame", "end_frame")
  }

  /** Duration-ensemble scoring through the BATCHED kernel
    * (DurationEnsemble.ensemble — demoTalkNet.py:225–270): one group
    * per track (the reference's per-cropped-file unit), frames sorted
    * to the track-local index the model slices on, one scoreBatch call
    * per (duration, batch), multiset mean, numpy-rint rounding. The
    * 100 Hz audio row count is 4× the video frames here (the exact
    * MFCC winstep=0.010 ratio for a stream cut at frame boundaries);
    * a real-media impl passes its actual MFCC row count and the
    * truncation arithmetic (:253–255) takes over. */
  def scoreTracks(spark: SparkSession, trackFrames: Dataset[Tracker.TrackFrame],
      scorer: SpeakerScorer): DataFrame = {
    import spark.implicits._
    trackFrames
      // track_id is scene-local (Tracker.trackAll) — the scoring unit
      // is one cropped track file, i.e. (video, scene, track)
      .groupByKey(tf => (tf.video_id, tf.scene_id, tf.track_id))
      .flatMapGroups { (key: (Long, Long, Long), it: Iterator[Tracker.TrackFrame]) =>
        val rows = it.toArray.sortBy(_.frame)
        val in = DurationEnsemble.EnsembleInput(key._1, key._3,
          nAudioFrames = rows.length * 4, nVideoFrames = rows.length)
        val scores = DurationEnsemble.ensemble(in, scorer)
        // nAudio = 4·nVideo exactly → no truncation, scores align 1:1
        rows.indices.iterator.map { j =>
          val tf = rows(j)
          (tf.video_id, tf.scene_id, tf.track_id, tf.frame, scores(j))
        }
      }
      .toDF("video_id", "scene_id", "track_id", "frame", "score")
  }

  /** Visualization smoothing with the reference's tail quirk
    * (slice upper bound min(i+3, n-1) is EXCLUSIVE of the last score):
    * per-track kernel mirroring the numpy slice exactly. */
  def smoothScoresQuirk(spark: SparkSession, scores: DataFrame): DataFrame = {
    import spark.implicits._
    scores.select(col("video_id").cast("long"), col("track_id").cast("long"),
        col("frame").cast("int"), col("score").cast("double"))
      .as[(Long, Long, Int, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Int, Double)]) =>
        val rows = it.toArray.sortBy(_._3)
        val n = rows.length
        rows.indices.iterator.map { i =>
          val lo = math.max(i - 2, 0)
          val hi = math.min(i + 3, n - 1) // exclusive — the quirk
          val slice = rows.slice(lo, hi)
          val m = if (slice.isEmpty) Double.NaN else slice.map(_._4).sum / slice.length
          (key._1, key._2, rows(i)._3, rows(i)._4, m)
        }
      }
      .toDF("video_id", "track_id", "frame", "score", "smoothed")
  }

  final case class PipelineResult(
      scenes: DataFrame, detections: DataFrame, tracks: DataFrame,
      procTracks: DataFrame, scores: DataFrame, segments: DataFrame,
      summary: DataFrame)

  /** The full DAG. `frames` = (video_id, frame, content) — the decoded
    * canonical-media table the ffmpeg kernel would produce. Optional
    * `checkpointDir` writes each stage as parquet with the reference's
    * stage names (scene/faces/tracks/scores — the pckl contract).
    * `scenesOverride` replaces the content-delta scene stage (used by
    * [[runFromPayloads]], whose ContentDetector semantics score each
    * frame AGAINST its predecessor rather than as a standalone
    * content value). */
  def run(spark: SparkSession, frames: DataFrame,
      detector: FaceDetector = StubDetector, scorer: SpeakerScorer = StubScorer,
      threshold: Double = 0.0, minDurationS: Double = 0.2,
      checkpointDir: Option[String] = None,
      scenesOverride: Option[DataFrame] = None): PipelineResult = {

    // Stage checkpoints are hive-partitioned by video_id (SURVEY §1.3):
    // per-video reads (the reference's resume/debug unit) prune to one
    // directory instead of scanning the corpus.
    def checkpoint(df: DataFrame, name: String): DataFrame = checkpointDir match {
      case Some(dir) =>
        df.write.mode("overwrite").partitionBy("video_id").parquet(s"$dir/$name")
        spark.read.parquet(s"$dir/$name")
      case None => df
    }

    import spark.implicits._
    // frames fans out to scene detection AND face detection; tracks
    // fan out to geometry AND scoring. Without stage checkpoints the
    // shared lineage would execute once per consumer — persist at the
    // two fan-out points (at 100 TB the parquet stage checkpoints play
    // this role, which is exactly the reference's pckl contract).
    val framesIn = if (checkpointDir.isEmpty)
      frames.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else frames
    val scenes = checkpoint(
      scenesOverride.getOrElse(SceneDetect.detectAll(spark, framesIn).toDF()), "scene")
    val dets = checkpoint(detectFaces(spark, framesIn, detector), "faces")
    val sceneDets = assignScenes(dets, scenes)
    val tracks = Tracker.trackAll(spark, sceneDets)
    val tracksDf0 = checkpoint(tracks.toDF(), "tracks")
    val tracksDf = if (checkpointDir.isEmpty)
      tracksDf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else tracksDf0
    val proc = TrackGeometry.procTracks(spark, tracksDf).toDF()
    val scores = checkpoint(
      scoreTracks(spark, tracksDf.as[Tracker.TrackFrame], scorer), "scores")
    val segments = SpeakingSegments.extract(scores,
      threshold, minDurationS, fps = 25, keyCols = Seq("video_id", "track_id"))
    // per-video human summary (extractSpeakingSegments.py:152–175)
    val summary = segments.groupBy(col("video_id"))
      .agg(countDistinct(col("track_id")).as("n_tracks"),
        count(lit(1)).as("n_segments"),
        sum(col("n_frames")).as("total_frames"),
        round(sum(col("duration_s") * 1000).cast("long") / 1000.0, 3).as("total_speaking_s"))
    PipelineResult(scenes, dets, tracksDf, proc, scores, segments, summary)
  }

  /** The full DAG from RAW frame payloads: scene cuts and the frames
    * table's content column both come from the REAL ContentDetector
    * chain (fixed-point HSV + mean-|Δ| vs the previous frame —
    * SceneDetect.contentVals; the first frame of a video scores 0.0,
    * the detector's no-predecessor frame). Only the payload decode
    * remains a stub seat. `payloads` = (video_id, frame, payload). */
  def runFromPayloads(spark: SparkSession, payloads: DataFrame, h: Int = 16, w: Int = 16,
      sceneThreshold: Double = 27.0, minSceneLen: Int = 15,
      detector: FaceDetector = StubDetector, scorer: SpeakerScorer = StubScorer,
      threshold: Double = 0.0, minDurationS: Double = 0.2,
      checkpointDir: Option[String] = None): PipelineResult = {
    import spark.implicits._
    val in = payloads
      .select(col("video_id").cast("long"), col("frame").cast("int"),
        col("payload").cast("binary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scenes = SceneDetect.contentScenes(spark, in, h, w, sceneThreshold, minSceneLen).toDF()
    val frames = in.as[(Long, Int, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (vid: Long, it: Iterator[(Long, Int, Array[Byte])]) =>
        val arr = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        val cv = SceneDetect.contentVals(arr, h, w).toMap
        arr.iterator.map { case (f, _) => (vid, f, cv.getOrElse(f, 0.0)) }
      }
      .toDF("video_id", "frame", "content")
    run(spark, frames, detector, scorer, threshold, minDurationS,
      checkpointDir, scenesOverride = Some(scenes))
  }
}
