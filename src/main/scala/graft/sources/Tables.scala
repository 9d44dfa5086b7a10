package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the driver's parquet tables (TESTDATA.md).
  *
  * Design notes for 100 TB scale: these return plain parquet scans, so
  * Catalyst predicate pushdown / column pruning / partition pruning all
  * apply — callers `select`/`filter` and the scan narrows accordingly.
  * Nothing is cached or collected here.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
  * read by default (PARQUET_TYPE_ILLEGAL). We flip
  * `spark.sql.legacy.parquet.nanosAsLong` and surface the column as
  * `ts_ns: LongType` (epoch nanoseconds — exactly DuckDB's
  * `epoch_ns(ts)`, which keeps oracle comparisons integer-exact) plus a
  * microsecond-precision `ts` TimestampType for event-time operators.
  * The driver's generator emits whole-microsecond values, so no
  * precision is lost in `ts`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts_ns: Long` (epoch nanos) and `ts: Timestamp` (µs).
    *
    * `ts_ns` is truncated to whole microseconds (`DIV 1000 * 1000`):
    * the raw file carries sub-µs nanos, but DuckDB's TIMESTAMP is
    * µs-precision, so the oracle only ever sees µs — truncating here
    * keeps every derived integer (gaps, durations, bounds) bit-equal.
    * Truncation is monotone, so orderings are unaffected.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ns", expr("(ts_ns DIV 1000) * 1000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }
}
