package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's CSV / trial-list scan surface (SURVEY §2.1):
  * AVA label CSVs with explicit schema + uid derivation
  * (get_ava_active_speaker_performance.py:81–86), the label
  * pos/neg split (utils/tools.py:110–113), per-entity clip bounds
  * (utils/tools.py:115–138), loader trial lists parsed positionally
  * (dataLoader.py:94–108), and the predictions CSV sink
  * (talkNet.py:107–115).
  *
  * Explicit `StructType`s — column projection and predicate pushdown
  * work from the schema, never from CSV header inference jobs.
  */
object AvaCsv {

  /** `*_orig.csv` schema (FIXTURES.md §1.1). */
  val labelSchema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("frame_timestamp", DoubleType),
    StructField("entity_box_x1", DoubleType),
    StructField("entity_box_y1", DoubleType),
    StructField("entity_box_x2", DoubleType),
    StructField("entity_box_y2", DoubleType),
    StructField("label", StringType),
    StructField("entity_id", StringType),
    StructField("label_id", IntegerType),
    StructField("instance_id", StringType)))

  /** AVA label scan + uid = concat(frame_timestamp, ':', entity_id)
    * (reference :85 — pandas str(float) formatting mirrored by
    * Spark's double→string cast for the same doubles). */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(labelSchema).option("header", "true").csv(path)
      .withColumn("uid",
        concat(col("frame_timestamp").cast("string"), lit(":"), col("entity_id")))

  /** pos (label_id=1) ∪ neg (label_id∈{0,2}) — utils/tools.py:110–114. */
  def posNegSplit(labels: DataFrame): (DataFrame, DataFrame) =
    (labels.filter(col("label_id") === 1),
     labels.filter(col("label_id") === 0 || col("label_id") === 2))

  /** Per-entity clip bounds: first/last frame_timestamp per entity_id
    * (utils/tools.py:115–138's sort+groupby first/last). */
  def entityClipBounds(labels: DataFrame): DataFrame =
    labels.groupBy(col("entity_id"))
      .agg(first(col("video_id")).as("video_id"),
        min(col("frame_timestamp")).as("clip_start"),
        max(col("frame_timestamp")).as("clip_end"))

  /** Loader trial list: positional tab/space-separated fields
    * (dataLoader.py:96–108; labels col de-bracketed :82–86). */
  def readTrialList(spark: SparkSession, path: String, sep: String = "\t"): DataFrame =
    spark.read.text(path)
      .withColumn("f", split(col("value"), sep))
      .select(
        element_at(col("f"), 1).as("data_name"),
        element_at(col("f"), 2).cast("int").as("num_frames"),
        element_at(col("f"), 3).cast("double").as("fps"),
        transform(
          split(regexp_replace(element_at(col("f"), 4), "[\\[\\]\\s]", ""), ","),
          x => x.cast("int")).as("labels"))
      .withColumn("video_name", substring(col("data_name"), 1, 11))

  /** Predictions CSV sink: add score/label, drop label_id/instance_id,
    * write headered CSV (talkNet.py:107–115). */
  def writePredictions(labels: DataFrame, scores: DataFrame, outPath: String): Unit =
    labels.join(scores, Seq("uid"), "inner")
      .withColumn("label", when(col("score") > 0, lit("SPEAKING_AUDIBLE"))
        .otherwise(lit("NOT_SPEAKING")))
      .drop("label_id", "instance_id")
      .write.mode("overwrite").option("header", "true").csv(outPath)
}
