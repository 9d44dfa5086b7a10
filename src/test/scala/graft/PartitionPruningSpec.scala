package graft

import org.apache.spark.sql.functions._

/** Partition pruning on a Hive-style partitioned layout: the q97
  * shape must carry its predicate as a PartitionFilter (planning-time
  * pruning — unmatched partition directories are never read), not as
  * a post-scan Filter. */
class PartitionPruningSpec extends SparkSpec {

  test("partitioned write + filtered read prunes partitions at planning time") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/e"
    graft.sources.Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("click"),
      s"predicate did not reach PartitionFilters:\n$scan")
    // and pruning is real: the filtered scan reads strictly fewer
    // files than the unfiltered one (one partition dir of five)
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
        case other => fail(s"expected FileSourceScanExec, got $other")
      }
    }
    val pruned = numFiles(q)
    val full = numFiles(spark.read.parquet(out))
    assert(pruned > 0 && pruned < full, s"pruned=$pruned full=$full")
  }

  test("q259: a dim-join selection prunes fact partitions at RUNTIME (DPP)") {
    // the q259 shape: the selected partitions are only knowable
    // through the dim join, so the fact scan must carry a
    // DynamicPruningExpression (not a static PartitionFilter literal)
    // and still read strictly fewer files than the full layout
    val df = SparkEntry.queries("q259_dynamic_pruning")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan carries no DynamicPruningExpression:\n$plan")
    // AQE wraps the join stages in QueryStageExec nodes that plain
    // collect() does not descend into — walk them explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(df.queryExecution.executedPlan)
      .filter(_.toString.contains("fact")).head
    val read = factScan.metrics("numFiles").value
    val layout = factScan.relation.location.inputFiles.length
    assert(read > 0 && read < layout,
      s"DPP read $read of $layout files — nothing pruned")
  }
}
