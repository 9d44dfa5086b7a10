package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins the schema-adaptive events contract (the round-8 driver
  * regeneration changed `ts` from TIMESTAMP(NANOS) — an epoch-ns long
  * under `nanosAsLong` — to plain TIMESTAMP(MICROS), which silently
  * broke every events-derived query). Both file vintages must surface
  * the identical (ts_ns whole-µs epoch nanos, µs TimestampType ts)
  * contract, bit-equal between each other and to DuckDB's
  * epoch_ns(ts). */
class EventsSchemaSpec extends SparkSpec {

  test("nanos-long and micros-timestamp vintages surface identical ts_ns") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_evschema")
    val nanosDir = base.resolve("nanos").toString
    val microsDir = base.resolve("micros").toString
    // whole-µs instants plus one with sub-µs nanos (the nanos vintage
    // carried those; truncation must make both vintages agree)
    val rows = Seq(
      (1L, 1700000000_000000000L, 10L, "view", 1.5, "{}"),
      (2L, 1700000001_234567000L, 11L, "click", 2.5, "{}"),
      (3L, 1700000002_345678901L, 12L, "view", 3.5, "{}"))
    // nanos vintage: ts is a raw epoch-ns LONG (what nanosAsLong
    // yields from a TIMESTAMP(NANOS) file)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // micros vintage: ts is TIMESTAMP_NTZ at µs precision (truncated
    // like the generator's µs output)
    rows.map { case (e, ns, u, t, v, p) => (e, ns / 1000L, u, t, v, p) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val a = Tables.events(spark, nanosDir)
      .select("event_id", "ts_ns", "ts").collect().sortBy(_.getLong(0))
    val b = Tables.events(spark, microsDir)
      .select("event_id", "ts_ns", "ts").collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
    // whole-µs invariant (what keeps DuckDB integer parity)
    assert(a.forall(_.getLong(1) % 1000L == 0L))
    // sub-µs nanos truncate toward zero: ...678901 → ...678000
    assert(a(2).getLong(1) == 1700000002_345678000L)
  }

  test("column order and dtypes match across vintages") {
    val real = Tables.events(spark, sf001)
    assert(real.columns.toSeq ==
      Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts"))
    assert(real.schema("ts_ns").dataType.typeName == "long")
    assert(real.schema("ts").dataType.typeName == "timestamp")
  }
}
