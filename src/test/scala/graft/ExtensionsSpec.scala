package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the native expressions at session build
  * time (needs its own SparkSession, so not SparkSpec). */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes rolling_hash and dotp in SQL") {
    // getOrCreate reuses a shared session and skips extensions — build
    // an isolated one, then restore the previous default for the rest
    // of the suite run.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // .withExtensions works on fresh AND pre-existing SparkContexts;
    // the "spark.sql.extensions" config form is equivalent but only
    // read when the SparkContext itself is created.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT rolling_hash('abc') AS h, dotp(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head()
      // ((0*31+97)*31+98)*31+99 = 96354 (mod 1e9+7 unchanged)
      assert(r.getLong(0) === (('a'.toLong * 31 + 'b') * 31 + 'c') % 1000000007L)
      assert(r.getDouble(1) === 11.0)

      // SelfDotRewrite: SQL-authored dotp(e, e) over a NON-literal
      // column (literals constant-fold before the rewrite is visible)
      // optimizes to norm2
      spark.range(3).selectExpr("array(CAST(id AS DOUBLE), 2.0d) AS v")
        .createOrReplaceTempView("graft_ext_vecs")
      val selfDot = spark.sql("SELECT dotp(v, v) AS n2 FROM graft_ext_vecs")
      assert(selfDot.queryExecution.optimizedPlan.toString.contains("norm2"),
        selfDot.queryExecution.optimizedPlan.toString)
      assert(selfDot.orderBy("n2").head().getDouble(0) === 4.0) // 0²+2²
      // …but distinct columns keep the binary op
      val cross = spark.sql(
        "SELECT dotp(v, array(1.0d, 1.0d)) AS d FROM graft_ext_vecs")
      assert(!cross.queryExecution.optimizedPlan.toString.contains("norm2"))
      assert(cross.orderBy("d").head().getDouble(0) === 2.0) // 0+2
      // FoldedDotRewrite: the docs-idiomatic declarative dot product
      // compiles to the dot_fold kernel...
      spark.range(3).selectExpr(
          "array(CAST(id AS DOUBLE), 2.0d) AS v",
          "array(CAST(id AS DOUBLE), 3.0d) AS w")
        .createOrReplaceTempView("graft_ext_pairs")
      val folded = spark.sql(
        """SELECT aggregate(zip_with(v, w, (x, y) -> x * y), 0.0d,
          |  (acc, e) -> acc + e) AS d FROM graft_ext_pairs""".stripMargin)
      assert(folded.queryExecution.optimizedPlan.toString.contains("dot_fold"),
        folded.queryExecution.optimizedPlan.toString)
      assert(folded.orderBy("d").head().getDouble(0) === 6.0) // 0·0 + 2·3
      // ...with zip_with's exact degenerate semantics preserved:
      // unequal lengths → null, null element → null (NOT dotp's
      // min-length / null-blind answers)
      val degenerate = spark.sql(
        """SELECT
          |  aggregate(zip_with(array(1.0d), array(1.0d, 1.0d), (x, y) -> x * y),
          |    0.0d, (acc, e) -> acc + e) AS len_mismatch,
          |  aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 1.0d),
          |    (x, y) -> x * y), 0.0d, (acc, e) -> acc + e) AS null_elem""".stripMargin)
      // constant-folding evaluates dot_fold's eval path; a projected
      // column exercises codegen — check both
      assert(degenerate.head().isNullAt(0) && degenerate.head().isNullAt(1))
      val rows = spark.sql(
        """SELECT id, aggregate(zip_with(
          |    CASE WHEN id % 2 = 0 THEN array(CAST(id AS DOUBLE)) ELSE v END,
          |    w, (x, y) -> x * y), 0.0d, (acc, e) -> acc + e) AS d
          |FROM (SELECT id, array(CAST(id AS DOUBLE), 2.0d) AS v,
          |        array(CAST(id AS DOUBLE), 3.0d) AS w
          |      FROM range(2))
          |ORDER BY id""".stripMargin).collect()
      assert(rows(0).isNullAt(1))                 // id=0: 1-elem vs 2-elem → null
      assert(rows(1).getDouble(1) === 1.0 + 6.0)  // id=1: 1·1 + 2·3
      // a -0.0 seed must NOT rewrite (empty-array result differs)
      val negZero = spark.sql(
        "SELECT aggregate(zip_with(v, w, (x, y) -> x * y), -0.0d, (acc, e) -> acc + e) AS d FROM graft_ext_pairs")
      assert(!negZero.queryExecution.optimizedPlan.toString.contains("dot_fold"))
    } finally {
      // do NOT spark.stop(): the SparkContext is shared JVM-wide with
      // the other suites; just restore the session slots
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
