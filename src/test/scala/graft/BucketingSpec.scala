package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at WRITE time: a fact↔fact
  * equi-join on the bucket key needs no Exchange at read time — the
  * technique for repeated large joins at 100 TB (vs broadcast for
  * dims, salting/AQE for skew). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle Exchange") {
    val dir = "/root/testdata/sf0.001"
    // external tables via option("path") — warehouse.dir is static conf
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val n = 8
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_nationkey")
      .write.mode("overwrite").format("parquet")
      .bucketBy(n, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same rows as the plain join
      val plain = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
