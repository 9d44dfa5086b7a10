package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rung-3+ measurement main for the SAMPLED triangle path (round-14
  * verdict task 1): exact q173's cost is the wedge mass (~270 GB at
  * sf30 — past one box's scratch, ARCHITECTURE.md "Scale ladder rung
  * 4"), so the rung-3 number the estimate exists to provide can only
  * be measured by running q278's sampled leg ALONE. Builds the same
  * co-purchase edge list, applies q278's pinned-hash p = 1/5 sample
  * (same salt 27800 — the probe measures the exact plan the query
  * ships), runs the shared degree-oriented wedge count on the sample,
  * and prints one JSON line: seconds, sampled triangles, the 125×
  * estimate. Timing starts BEFORE the edge build: the sample's honest
  * cost includes reading the graph (at p=1/5 the edge scan dominates
  * less than the p²-scaled wedge shuffle, and a real run pays both).
  */
object TriSampleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen lead (the one-shot probe lesson): a throwaway small
    // run so the timed cell measures the plan, not compilation
    leadCell(spark)

    val t0 = System.nanoTime()
    val li = sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.groupBy(col("ok"))
      .agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("node"), col("ps"))
      .select(col("node"), explode(col("ps")).as("nbr"))
      .filter(col("node") =!= col("nbr"))
      .distinct()
    // the PRODUCTION estimate-only plan: sample FIRST (the whole
    // point of DOULION is to never pay the exact plan's cost), then
    // orient the SAMPLE — degree tables and orientation joins are p×
    // cheaper than the full graph's. q278 itself shares ONE full
    // orientation between its legs because it must also produce the
    // exact count (the calibration row); a run that wants only the
    // estimate takes this plan. Same pinned hash on the canonical
    // pair → same surviving edges; orientation order is count-free.
    val keepSql = "(" + queries.Q.uhashSql("27800",
      "least(node, nbr) * 4294967296 + greatest(node, nbr)") + ") % 5 = 0"
    val op = queries.AnalyticsQueries11
      .orientEdges(edges.filter(expr(keepSql))).persist()
    val cnt = queries.AnalyticsQueries11.wedgeCountFromOp(op, "sampled")
    val row = cnt.head()
    val dt = (System.nanoTime() - t0) / 1e9
    op.unpersist()
    val s = row.getLong(0)
    println(s"""{"metric":"tri_sample_p0.2","value":${f"$dt%.2f"},""" +
      s""""unit":"sec","sampled_triangles":$s,"est_triangles":${s * 125},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }

  private def leadCell(spark: SparkSession): Unit = {
    val dir = "/root/testdata/sf0.001"
    val e = sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(col("ps")).as("node"), col("ps"))
      .select(col("node"), explode(col("ps")).as("nbr"))
      .filter(col("node") =!= col("nbr")).distinct()
    val op = queries.AnalyticsQueries11.orientEdges(e).persist()
    queries.AnalyticsQueries11.wedgeCountFromOp(op, "warm").head()
    op.unpersist()
  }
}
