package graft

import org.apache.spark.sql.functions._

/** Unit tests for [[BroadcastHintAudit]]'s structural bound proof —
  * the classifier QueriesSmokeSpec runs over every query's analyzed
  * plan. Each case is a minimal frame shaped like a real hint site. */
class BroadcastHintSpec extends SparkSpec {

  private def unproven(df: org.apache.spark.sql.DataFrame): Int =
    BroadcastHintAudit.unprovenHints(
      df.queryExecution.analyzed).size

  test("dimension-table hint is bounded") {
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
    assert(unproven(cust.join(broadcast(nation),
      col("c_nationkey") === col("n_nationkey"))) == 0)
  }

  test("1-row global aggregate hint is bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val tot = docs.agg(count(lit(1)).as("n"))
    assert(unproven(docs.crossJoin(broadcast(tot))) == 0)
  }

  test("bounded-key aggregate hint is bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.join(broadcast(perLang), Seq("lang"))) == 0)
  }

  test("limit hint is bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val top = docs.orderBy(col("doc_id")).limit(10)
    assert(unproven(docs.crossJoin(broadcast(
      top.select(col("doc_id").as("q")))) ) == 0)
  }

  test("join/filter/project over bounded inputs stays bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_a"))
    val b = docs.agg(max(col("n_chars")).as("mx"))
    val dim = a.crossJoin(b).filter(col("n_a") > 0)
      .select(col("lang"), col("n_a"), col("mx"))
    assert(unproven(docs.join(broadcast(dim), Seq("lang"))) == 0)
  }

  test("fact-table hint is NOT bounded (the q173 cliff class)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    assert(unproven(li.join(broadcast(docs.select(
      col("doc_id").as("l_orderkey"))), Seq("l_orderkey"))) == 1)
  }

  test("unbounded-key aggregate hint is NOT bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // per-doc aggregate: cardinality grows with the corpus
    val perDoc = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.join(broadcast(perDoc), Seq("doc_id"))) == 1)
  }

  test("a corpus key RENAMED to a bounded name is NOT bounded " +
      "(round-15 verdict task 3: name collisions must fail)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // doc_id values under the name "lang": the r15 name-based gate
    // "proved" this bounded; the alias chase resolves it to doc_id
    val perFakeLang = docs.select(col("doc_id").as("lang"), col("n_chars"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.join(broadcast(perFakeLang), Seq("lang"))) == 1)
  }

  test("modulus bucket keys are bounded by the expression, renames included") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val bucketed = docs.withColumn("bkt", expr("doc_id % 128"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.withColumn("bkt", expr("doc_id % 128"))
      .join(broadcast(bucketed), Seq("bkt"))) == 0)
    // but a corpus-sized modulus proves nothing
    val huge = docs.withColumn("bkt", expr("doc_id % 1000000000"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.withColumn("bkt", expr("doc_id % 1000000000"))
      .join(broadcast(huge), Seq("bkt"))) == 1)
  }

  test("all-literal CASE keys are bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val split = docs.withColumn("split",
        expr("CASE WHEN doc_id % 10 < 8 THEN 'train' " +
          "WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END"))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
    assert(unproven(docs.crossJoin(broadcast(split))) == 0)
  }

  test("shuffle-strategy hints are exempt; replicate-NL is not (round-16)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey").as("doc_id"))
    // a SHUFFLE_HASH hint over a fact table has no driver build and a
    // per-partition map bounded by (bytes / partitions) — no proof needed
    assert(unproven(docs.join(li.hint("shuffle_hash"), Seq("doc_id"))) == 0)
    assert(unproven(docs.join(li.hint("merge"), Seq("doc_id"))) == 0)
    // but replicating a fact table (cartesian cliff) still trips the gate
    assert(unproven(docs.crossJoin(li.hint("shuffle_replicate_nl"))) == 1)
  }

  test("explode over a bounded input is NOT bounded without a whitelist") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val grams = docs.agg(collect_list(col("lang")).as("ls"))
      .select(explode(col("ls")).as("lang"))
    assert(unproven(docs.join(broadcast(grams), Seq("lang"))) == 1)
  }
}
