package graft

import graft.sources.v2.TrialListSource
import org.apache.spark.sql.functions._

/** The custom DataSource V2 trial-list reader: schema, parsing (incl.
  * optional trailing tag), per-file partitioning, category-filter
  * pushdown, and column pruning reaching the physical scan. */
class TrialListV2Spec extends SparkSpec {

  private def fmt = classOf[TrialListSource].getName

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tlv2")
    // the three real line shapes from TalkSet/lists/lists_out
    java.nio.file.Files.write(dir.resolve("a.txt"), java.util.Arrays.asList(
      "TAudio id06358/1Dy3Ro1Qqbo/00003 id06358/1Dy3Ro1Qqbo/00003 5.12 0 5.12 0 0",
      "TFAudio id01275/HIJz6VB4Ezo/00072 id05784/jYvZCmBte1Y/00105 4.6 1.29 4.6 0 1.29 027000",
      ""))
    java.nio.file.Files.write(dir.resolve("b.txt"), java.util.Arrays.asList(
      "TSilence silence/NPSelwWdPa0/03360 silence/NPSelwWdPa0/03360 4.26 0 2.31 2.31 4.26 027001"))
    dir.toString
  }

  test("parses both 8- and 9-field lines; skips blanks; one partition per file") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
    val rows = df.orderBy("category").collect()
    assert(rows.length === 3)
    assert(df.rdd.getNumPartitions === 2)
    val ta = rows.find(_.getString(0) == "TAudio").get
    assert(ta.getString(1) === "id06358/1Dy3Ro1Qqbo/00003")
    assert(ta.getDouble(3) === 5.12 && ta.isNullAt(8))
    val tf = rows.find(_.getString(0) == "TFAudio").get
    assert(tf.getString(8) === "027000" && tf.getDouble(4) === 1.29)
  }

  test("category equality is pushed into the scan; other filters stay in Spark") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
      .filter(col("category") === "TFAudio" && col("d1") > 1.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedCategory=TFAudio"), plan)
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getString(2) === "id05784/jYvZCmBte1Y/00105")
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = spark.read.format(fmt).option("path", writeFixture()).load()
      .select("audio_name", "d2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema=audio_name,d2"), plan)
    assert(df.collect().map(_.getDouble(1)).sorted.toSeq === Seq(0.0, 0.0, 1.29).sorted)
  }

  test("single-file path load works") {
    val dir = writeFixture()
    val df = spark.read.format(fmt).option("path", s"$dir/b.txt").load()
    assert(df.count() === 1)
  }
}
