package graft

/** Every declared query runs at sf0.001 and (apart from known-empty
  * ones) returns rows; entry() satisfies the driver smoke check. */
class QueriesSmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set("q08_customers_without_orders")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
