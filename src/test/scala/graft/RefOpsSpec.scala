package graft

import graft.operators.{BatchPack, Similarity}
import org.apache.spark.sql.functions._

/** Pins the semantics of the RefOps pack's operators against direct
  * transcriptions of the reference control flow. */
class RefOpsSpec extends SparkSpec {

  /** Direct transcription of dataLoader.py:96–104. */
  private def referencePack(items: Seq[(Long, Long)], batchSize: Long): Seq[Seq[Long]] = {
    val sorted = items.sortBy(t => (-t._2, -t._1))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var start = 0
    while (start < sorted.length) {
      val length = sorted(start)._2
      val end = math.min(sorted.length, start + math.max((batchSize / length).toInt, 1))
      batches += sorted.slice(start, end).map(_._1)
      start = end
    }
    batches.toSeq
  }

  test("BatchPack matches the reference greedy slicing incl. cap-0 → 1 clamp") {
    val items = Seq((1L, 900L), (2L, 700L), (3L, 600L), (4L, 300L), (5L, 300L),
      (6L, 100L), (7L, 2600L), (8L, 50L))
    val df = spark.createDataFrame(items.map { case (id, len) => ("a", id, len) })
      .toDF("cat", "id", "len")
    val got = BatchPack.pack(spark, df, 2500L).collect()
      .groupBy(_.getLong(1)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getLong(2)).toSeq)
    val want = referencePack(items, 2500L)
    assert(got.size === want.size)
    for ((g, w) <- got.zip(want)) assert(g.toSet === w.toSet, s"$got vs $want")
  }

  test("BatchPack packs categories independently and in parallel") {
    val rows = (1L to 500L).map(id => (s"c${id % 7}", id, id % 37 + 10))
    val df = spark.createDataFrame(rows).toDF("cat", "id", "len")
    val out = BatchPack.pack(spark, df, 300L)
    assert(out.count() === 500)
    // every batch's frame total ≈ bounded: rows_in_batch <= max(300/len_max_of_batch, 1)
    val bad = out.groupBy("cat", "batch_id")
      .agg(count(lit(1)).as("n"), max("len").as("maxlen"))
      .filter(col("n") > greatest(floor(lit(300) / col("maxlen")), lit(1)))
    assert(bad.count() === 0)
  }

  test("IVF assigns every vector to a real centroid cell; top-k self-free and sorted") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.ivfTopK(spark, spark.read.parquet(s"$dir/embeddings.parquet"), k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) != r.getLong(0)), "self in top-k")
    val byQ = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byQ) {
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.toSeq === (1L to ranks.length))
      val coss = rs.sortBy(_.getLong(2)).map(_.getDouble(4))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b }, "cos not desc")
    }
  }

  test("wrap-pad expression replicates numpy.pad 'wrap'") {
    // numpy.pad([1,2,3], (0,5), 'wrap') == [1,2,3,1,2,3,1,2]
    val df = spark.sql("SELECT transform(sequence(0, 7), i -> element_at(array(1,2,3), i % 3 + 1)) AS p")
    assert(df.first().getSeq[Int](0) === Seq(1, 2, 3, 1, 2, 3, 1, 2))
  }

  test("session_window: exactly-gap-apart events MERGE (split only when diff > gap)") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-01 00:00:00"), (1L, "2026-01-01 00:30:00"),
      (1L, "2026-01-01 01:00:01")).toDF("u", "t")
      .withColumn("ts", to_timestamp(col("t")))
    val out = df.groupBy(col("u"), session_window(col("ts"), "30 minutes")).count().collect()
    // 00:00→00:30 diff == gap → merge; 00:30→01:00:01 diff > gap → split
    assert(out.length === 2)
    assert(out.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L))
  }

  test("kernel queries are partition-count independent (3 vs 17 shuffle partitions)") {
    val dir = "/root/testdata/sf0.001"
    def digest(name: String): Seq[String] = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect().map(_.toString).sorted.toSeq
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", 3)
      val at3 = Seq("q50_noise_pair_mix", "q57_embedding_neardup", "q56_ap_aggregator").map(digest)
      spark.conf.set("spark.sql.shuffle.partitions", 17)
      val at17 = Seq("q50_noise_pair_mix", "q57_embedding_neardup", "q56_ap_aggregator").map(digest)
      assert(at3 === at17)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("frame remap matches python int(f/29.97*25) truncation") {
    // python: [int(f/29.97*25) for f in [0,1,29,30,59,60,2997]] == [0,0,24,25,49,50,2500]
    val got = spark.range(0, 3000)
      .select(floor(col("id") / lit(29.97) * lit(25)).cast("long").as("f"))
      .collect().map(_.getLong(0))
    assert(got(0) === 0L && got(1) === 0L && got(29) === 24L && got(30) === 25L)
    assert(got(59) === 49L && got(60) === 50L && got(2997) === 2500L)
  }
}
