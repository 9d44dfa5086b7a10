package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for oracle-exact query authoring.
  *
  * Floating-point policy — keeps Spark results bit-identical to the
  * driver's DuckDB oracle while staying order-independent (and thus
  * partition-count-independent, which is what makes the same plan
  * correct on a 1000-executor cluster):
  *
  *  1. Never SUM raw doubles across rows: the order of partial
  *     aggregation is nondeterministic under parallelism. Scale to
  *     integer cents/micros first (`cents`), sum longs (exact,
  *     associative), divide once at the end.
  *  2. Per-row double math must use the exact same IEEE expression
  *     tree as the oracle SQL (same ops, same order, same casts).
  *  3. `round()` is only ever applied to identically-derived doubles
  *     (same double in, same double out on both engines).
  *  4. Every query output is deterministically ordered on non-null
  *     keys, and output columns are only STRING / LONG / DOUBLE.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** value → integer cents (exact long; oracle: CAST(round(v*100) AS BIGINT)). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact order-independent money sum (long cents). */
  def centsSum(c: Column): Column = sum(cents(c))

  /** Exact scaled-integer sum of an already-deterministic double:
    * oracle: CAST(sum(CAST(round(x*1e6) AS BIGINT)) AS BIGINT). */
  def microsSum(c: Column): Column = sum(round(c * 1e6).cast("long"))
}

/** A named bundle of queries plus their DuckDB oracle SQL. */
trait QueryPack {
  def queries: Map[String, Q.Fn]
  def oracle: Map[String, String]
}
