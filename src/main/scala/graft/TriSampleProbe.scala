package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rung-3+ measurement main for the SAMPLED triangle path (round-14
  * verdict task 1): exact q173's cost is the wedge mass (~270 GB at
  * sf30 — past one box's scratch, ARCHITECTURE.md "Scale ladder rung
  * 4"), so the rung-3 number the estimate exists to provide can only
  * be measured by running the sampled leg ALONE. Builds the shared
  * co-purchase edge list and runs the ESTIMATE-ONLY production plan
  * q281 oracle-gates: sample FIRST with the pinned hash (same salt
  * 27800 as q278/q280/q281), then orient the p-fraction — i.e. this
  * probe measures the plan a 100 TB estimate-only run executes (and
  * that q281 ships), NOT q278's shared-orientation sampled leg
  * (q278 orients the FULL graph because it must also produce the
  * exact calibration count; both plans count the same triangle set —
  * TriangleSpec pins that equivalence at sf0.001).
  *
  * Knobs (round-15 verdict task 2 — the err-vs-p curve needs rungs):
  *  - SPARK_GRAFT_TRI_P: comma list of sample denominators
  *    (default "5"); one timed cell per denominator, sparsest first
  *    so a denser pass never warms the next cell's input cache.
  *  - SPARK_GRAFT_TRI_EXACT=1: adds an exact (p=1) cell — feasible
  *    through sf10 (59.8 s measured, rung 2), NOT at sf30.
  * One JSON line per cell: seconds, sampled/exact triangles, the
  * pd³-scaled estimate. Timing starts BEFORE the edge build: the
  * sample's honest cost includes reading the graph.
  */
object TriSampleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val pds = sys.env.getOrElse("SPARK_GRAFT_TRI_P", "5")
      .split(",").map(_.trim.toLong).toSeq
    val withExact = sys.env.get("SPARK_GRAFT_TRI_EXACT").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen lead (the one-shot probe lesson): a throwaway small
    // run so the timed cells measure the plan, not compilation
    leadCell(spark)

    // sparsest first: no cell's scan can pre-warm a later one beyond
    // what every cell pays identically (the OS page cache on parquet)
    for (pd <- pds.sortBy(-_)) run(spark, sfDir, pd)
    if (withExact) run(spark, sfDir, 1L)
    spark.stop()
  }

  /** One timed cell: the estimate-only plan at p = 1/pd (pd = 1 ⟹
    * the exact degree-oriented wedge count, same code path). */
  private def run(spark: SparkSession, sfDir: String, pd: Long): Unit = {
    val t0 = System.nanoTime()
    // canonical build + in-place orientation — the exact plan q281
    // ships after the round-16 rewrite (half the symmetric build's
    // row mass; same oriented row set, TriangleSpec pins the equality)
    val edges = queries.AnalyticsQueries11.coPurchaseEdgesCanon(spark, sfDir)
    val keepSql = "(" + queries.Q.uhashSql("27800",
      "least(src, dst) * 4294967296 + greatest(src, dst)") + s") % $pd = 0"
    val sampled = if (pd == 1L) edges else edges.filter(expr(keepSql))
    val op = queries.AnalyticsQueries11.orientEdgesFromCanon(sampled).persist()
    val cnt = queries.AnalyticsQueries11.wedgeCountFromOp(op, "sampled")
    val row = cnt.head()
    val dt = (System.nanoTime() - t0) / 1e9
    op.unpersist()
    val s = row.getLong(0)
    // locale-pinned seconds: an unpinned %.2f emits a comma decimal
    // under comma-decimal locales — invalid JSON for the harness grep
    val secs = String.format(java.util.Locale.ROOT, "%.2f", Double.box(dt))
    println(s"""{"metric":"tri_sample_pd$pd","value":$secs,""" +
      s""""unit":"sec","sampled_triangles":$s,""" +
      s""""est_triangles":${s * pd * pd * pd},"sf":"$sfDir"}""")
  }

  private def leadCell(spark: SparkSession): Unit = {
    val e = queries.AnalyticsQueries11
      .coPurchaseEdgesCanon(spark, "/root/testdata/sf0.001")
    val op = queries.AnalyticsQueries11.orientEdgesFromCanon(e).persist()
    queries.AnalyticsQueries11.wedgeCountFromOp(op, "warm").head()
    op.unpersist()
  }
}
