package graft

import graft.nn.S3fdNetDetector
import graft.pipeline.BatchPipeline

/** The real S3FD network running INSIDE the Spark pipeline's face
  * detection stage (the seat that was a stub until round 8): the
  * detector serializes to executors (weights re-derived
  * deterministically per partition — zero bytes shipped), runs one
  * full VGG16 forward per frame in the partition iterator, and the
  * stage output is stable across runs. 32×64 frames keep the forward
  * affordable; the architecture is identical at 640×360. */
class NnSeatSpec extends SparkSpec {

  test("detectFaces runs the real S3FD forward per frame on executors") {
    import spark.implicits._
    val frames = Seq.tabulate(6)(f => (1L, f, 0.1 * f))
      .toDF("video_id", "frame", "content")
    // pseudo-trained weights score near 0.5 — drop both gates below
    // that (a trained checkpoint keeps the reference's 0.8/0.9)
    val det = new S3fdNetDetector(imh = 32, imw = 64, confTh = 0.05)
    val out1 = BatchPipeline.detectFaces(spark, frames, det, confTh = 0.4)
      .orderBy("video_id", "frame", "x1").collect()
    assert(out1.nonEmpty, "real-forward detector produced no detections at confTh=0.4")
    val out2 = BatchPipeline.detectFaces(spark, frames, det, confTh = 0.4)
      .orderBy("video_id", "frame", "x1").collect()
    assert(out1.toSeq == out2.toSeq, "detection stage is nondeterministic")
  }
}
