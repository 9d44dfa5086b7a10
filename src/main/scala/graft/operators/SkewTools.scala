package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: two-phase salted aggregation.
  * A hot grouping key (one very long video, one dominant event_type)
  * turns a single-phase shuffle agg into one straggler task; salting
  * splits each key into `buckets` sub-keys, aggregates partials per
  * (key, salt), then combines per key — both shuffles are balanced.
  *
  * Only algebraic aggregates compose this way; the library exposes the
  * (count, long-sum, min, max) set, which with the integer-scaling
  * policy (Q.cents) covers every sum/avg in the query pack.
  *
  * Join-side skew is handled by AQE (`spark.sql.adaptive.skewJoin`) —
  * enabled in the Bench/Verify sessions; salting an aggregation is the
  * one case AQE does not rebalance (partial aggregation amortizes most
  * of it, but a hot key still funnels every partial to one reducer —
  * salting splits that reducer).
  */
object SkewTools {

  /** Deterministic salt from stable columns (NOT rand(): retries and
    * speculative tasks must agree at 1000-executor scale). */
  def salt(saltSrc: Column, buckets: Int): Column =
    pmod(hash(saltSrc), lit(buckets))

  /** groupBy(keys).agg(count, sum(longCol), min(longCol), max(longCol))
    * computed via (keys, salt) partials. `saltSrc` must be a stable
    * per-row column (e.g. the row id). */
  def saltedLongStats(df: DataFrame, keys: Seq[String], longCol: Column,
      saltSrc: Column, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", salt(saltSrc, buckets))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"), sum(longCol).as("_s"),
        min(longCol).as("_mn"), max(longCol).as("_mx"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum"),
        min(col("_mn")).as("min"), max(col("_mx")).as("max"))
  }
}
