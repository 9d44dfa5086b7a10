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

  /** documents scan with a CPU-work parallelism guard (the round-17
    * measured finding, ARCHITECTURE.md "Scan parallelism vs CPU-heavy
    * text work"): text parquet compresses ~10×, so a 56 MB file is
    * ONE 128 MB-bound scan split carrying ~1.5 GB of tokenize/hash
    * work — the ladder probe caught whole text pipelines flat across
    * a 3× data step because they ran on 1–2 of 32 cores. Widen ONLY
    * when the scan has fewer splits than the session's parallelism:
    * at 100 TB the scan has thousands of splits and this is a no-op
    * (zero shuffle); in the few-large-files regime it decouples
    * per-row CPU parallelism from the split count. `.rdd` here only
    * materializes the physical scan to read its partition count — no
    * job runs. */
  def documentsWide(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "documents")
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** events with `ts_ns: Long` (epoch nanos) and `ts: Timestamp` (µs).
    *
    * Schema-adaptive: the driver's generator has shipped `ts` both as
    * parquet TIMESTAMP(NANOS) (read as an epoch-ns long via
    * `nanosAsLong`) and as plain TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Either way the surfaced contract is identical:
    * `ts_ns` is whole-microsecond epoch nanoseconds — exactly DuckDB's
    * `epoch_ns(ts)`, which is µs-precision for both physical types, so
    * every derived integer (gaps, durations, bounds) stays bit-equal
    * to the oracle — and `ts` is a µs TimestampType (the NTZ cast is
    * instant-preserving under the session's UTC timezone). Truncation
    * to whole µs is monotone, so orderings are unaffected.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) file
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_ns", expr("(ts_ns DIV 1000) * 1000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _ => // TIMESTAMP(MICROS) file (NTZ or LTZ)
        val tsUs = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.select(raw.columns.map {
            case "ts" => (unix_micros(tsUs) * lit(1000L)).as("ts_ns")
            case c    => col(c)
          }.toIndexedSeq: _*)
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    }
  }
}
