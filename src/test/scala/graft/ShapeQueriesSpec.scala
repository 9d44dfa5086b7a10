package graft

import graft.queries.ShapeQueries
import org.apache.spark.sql.functions._

/** Semantics pins for the round-10 pack beyond the oracle gate:
  * partition independence of the order-sensitive-looking plans,
  * losslessness of q154's bin machinery at bin boundaries, and branch
  * coverage of the q167 MERGE fold. */
class ShapeQueriesSpec extends SparkSpec {

  private def run(name: String) =
    ShapeQueries.queries(name)(spark, sf001)

  private def rowsOf(name: String): Seq[String] =
    run(name).collect().map(_.toString).toSeq

  test("q158 pagerank and q164 checksum are partition-count independent") {
    // Exact long arithmetic ⇒ the same answer under any parallelism.
    // The suite session runs at shuffle.partitions=4; re-run at 7 and
    // 13 and require identical row sets (incl. the checksum longs).
    for (name <- Seq("q158_pagerank", "q164_content_checksum")) {
      val base = rowsOf(name)
      for (p <- Seq("7", "13")) {
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", p)
        try assert(rowsOf(name) == base, s"$name drifts at partitions=$p")
        finally spark.conf.set("spark.sql.shuffle.partitions", old)
      }
    }
  }

  test("q154 bin expansion is lossless across a bin boundary") {
    import spark.implicits._
    // Two near-identical docs landing in ADJACENT 256-wide length
    // bins (255 vs 257 chars): only the 3-bin left expansion can pair
    // them. Body chars keep the 48-char shadow prefixes equal, so the
    // pair must surface with dist 0.
    val pad = "x ".repeat(200)
    val a = "same prefix for blocking here " + pad.substring(0, 225)
    val b = "same prefix for blocking here " + pad.substring(0, 227)
    assert(a.length == 255 && b.length == 257)
    assert(a.length / 256 != b.length / 256) // adjacent bins
    val docs = Seq((1L, a, "en"), (2L, b, "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("src0"))
    val dir = graft.queries.Q.scratchDir(spark, "shapespec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = ShapeQueries.queries("q154_fuzzy_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("q167 merge fold exercises kept, updated, and inserted branches") {
    val st = run("q167_merge_apply").groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.keySet == Set("kept", "updated", "inserted"), st.toString)
    assert(st.values.forall(_ > 0))
  }

  test("sketch+recount equals the exact heavy hitters under varied INPUT partitionings") {
    // The q155 claim is that the Misra–Gries candidate stage is a
    // superset of the true heavy hitters no matter how the token
    // stream is split across partitions. shuffle.partitions does NOT
    // vary that (the sketch runs on the scan's partitioning), so this
    // test repartitions the token stream itself — including the
    // adversarial single-partition and many-tiny-partitions splits —
    // and requires the sketch→recount pipeline to land on the exact
    // answer every time.
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast => bc}
    val rnd = new scala.util.Random(1550)
    val words = Seq.fill(20000)(s"w${math.sqrt(rnd.nextInt(2500)).toInt}")
    val n = words.size
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 200 > n }.toMap
    assert(exact.nonEmpty) // the test must actually have heavy hitters
    for (p <- Seq(1, 5, 32)) {
      val toks = words.toDF("w").repartition(p)
      val cand = toks.as[String]
        .mapPartitions(it => graft.operators.Sketches.misraGries(it, 256))
        .toDF("w").distinct()
      val got = toks.join(bc(cand), Seq("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 200 > n)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"partitions=$p: got ${got.size} vs ${exact.size}")
    }
  }
}
