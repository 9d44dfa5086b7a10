package graft

import org.apache.spark.sql.functions._

/** Proves the claim in ARCHITECTURE.md ("join-side skew is handled by
  * AQE"): a sort-merge join with one hot key gets its skewed
  * partition split by adaptive execution (AQEShuffleRead reports
  * skewed splits in the final plan). Aggregation-side skew is the
  * salted path (SkewTools, q58) — AQE does not rebalance that. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the SMJ path
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 90% on key 0 → one hot shuffle partition
      val left = spark.range(200000)
        .select((when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 100)).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("pay"))
      val right = spark.range(100).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k").agg(count(lit(1)))
      // collect() (not head(): head wraps a limit into a SEPARATE
      // execution, leaving this plan un-run and non-final)
      assert(joined.collect().head.getLong(0) === 200000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skewed"),
        s"AQE did not report a skew split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
