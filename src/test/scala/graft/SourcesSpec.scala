package graft

import graft.sources.AvaCsv
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CSV / trial-list / binaryFile scan surface (SURVEY §2.1). */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  private def writeLabelsCsv(): String = {
    val p = s"$tmp/labels.csv"
    val rows = Seq(
      "video_id,frame_timestamp,entity_box_x1,entity_box_y1,entity_box_x2,entity_box_y2,label,entity_id,label_id,instance_id",
      "vidA,902.16,0.1,0.2,0.3,0.4,SPEAKING_AUDIBLE,vidA_ent1,1,inst1",
      "vidA,902.2,0.1,0.2,0.3,0.4,NOT_SPEAKING,vidA_ent1,0,inst1",
      "vidA,903.0,0.5,0.5,0.7,0.9,SPEAKING_BUT_NOT_AUDIBLE,vidA_ent2,2,inst2")
    Files.write(java.nio.file.Paths.get(p),
      rows.mkString("\n").getBytes("UTF-8"))
    p
  }

  test("AVA label CSV scan: explicit schema + uid derivation") {
    val df = AvaCsv.readLabels(spark, writeLabelsCsv())
    assert(df.count() === 3)
    val uids = df.select("uid").collect().map(_.getString(0)).toSet
    assert(uids.contains("902.16:vidA_ent1"))
    assert(df.schema("frame_timestamp").dataType.typeName === "double")
  }

  test("pos/neg label split (label_id 1 vs 0/2)") {
    val (pos, neg) = AvaCsv.posNegSplit(AvaCsv.readLabels(spark, writeLabelsCsv()))
    assert(pos.count() === 1 && neg.count() === 2)
  }

  test("entity clip bounds: min/max frame_timestamp per entity") {
    val b = AvaCsv.entityClipBounds(AvaCsv.readLabels(spark, writeLabelsCsv()))
      .orderBy("entity_id").collect()
    assert(b.length === 2)
    assert(b(0).getAs[Double]("clip_start") === 902.16)
    assert(b(0).getAs[Double]("clip_end") === 902.2)
  }

  test("trial list scan: positional fields + bracketed labels") {
    val p = s"$tmp/trials.txt"
    Files.write(java.nio.file.Paths.get(p),
      "entAclip00001\t87\t25.0\t[1, 1, 0, 1]\nentBclip00002\t40\t29.97\t[0, 0]"
        .getBytes("UTF-8"))
    val df = AvaCsv.readTrialList(spark, p)
    val r = df.orderBy("data_name").collect()
    assert(r(0).getAs[String]("data_name") === "entAclip00001")
    assert(r(0).getAs[Int]("num_frames") === 87)
    assert(r(0).getAs[Seq[Int]]("labels") === Seq(1, 1, 0, 1))
    assert(r(0).getAs[String]("video_name") === "entAclip000") // [:11]
  }

  test("predictions CSV sink: adds score/label, drops label_id/instance_id") {
    import spark.implicits._
    val labels = AvaCsv.readLabels(spark, writeLabelsCsv())
    val scores = Seq(("902.16:vidA_ent1", 1.2), ("902.2:vidA_ent1", -0.3),
      ("903.0:vidA_ent2", 0.1)).toDF("uid", "score")
    val out = s"$tmp/preds"
    AvaCsv.writePredictions(labels, scores, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === 3)
    assert(!back.columns.contains("label_id") && !back.columns.contains("instance_id"))
    assert(back.filter(col("label") === "SPEAKING_AUDIBLE").count() === 2)
  }

  test("binaryFile scan with glob filter (video catalog analog)") {
    Files.write(java.nio.file.Paths.get(s"$tmp/a.mp4"), Array[Byte](1, 2, 3))
    Files.write(java.nio.file.Paths.get(s"$tmp/b.txt"), Array[Byte](9))
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mp4").load(tmp)
    val rows = df.select("path", "length").collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0).endsWith("a.mp4") && rows(0).getLong(1) === 3L)
  }
}
