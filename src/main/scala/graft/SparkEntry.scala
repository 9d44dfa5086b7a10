package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in per-category packs under `graft.queries`; each pack
  * carries both the Spark plan and its DuckDB oracle SQL. Keys are
  * stable `qNN_name` identifiers; Spark output columns and oracle SQL
  * aliases match exactly (the driver's compare sorts columns by name).
  */
object SparkEntry {
  private val packs: Seq[QueryPack] =
    Seq(Relational, Windowed, TextQueries, VectorQueries, KernelQueries, DomainQueries, RefOps, NnQueries, ShapeQueries, AnalyticsQueries, AnalyticsQueries2, AnalyticsQueries3, AnalyticsQueries4, AnalyticsQueries5, AnalyticsQueries6, AnalyticsQueries7, AnalyticsQueries8, AnalyticsQueries9, AnalyticsQueries10, AnalyticsQueries11)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q62 is the reference's hallmark relational shape: the
    * 1:1-validated gt ⋈ pred merge + bbox tolerance audit
    * (get_ava_active_speaker_performance.py:94–142). */
  def entry(spark: SparkSession): DataFrame =
    queries("q62_ava_merge_audit")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
