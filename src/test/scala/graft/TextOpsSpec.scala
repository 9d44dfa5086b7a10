package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Pins the corpus-prep operators' boundary semantics: chunk start
  * grid / last-short-chunk rule, n-gram underflow, decontamination
  * counts (distinct shared grams, clean docs kept with 0). */
class TextOpsSpec extends SparkSpec {

  private def doc(id: Long, n: Int) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("chunk: start grid, last short chunk, sub-window doc = one chunk") {
    import spark.implicits._
    // window=40 stride=30: n=1/39/40 → one chunk; 41 → two; 100 → four
    val docs = Seq(doc(1, 1), doc(2, 39), doc(3, 40), doc(4, 41), doc(5, 100))
      .toDF("doc_id", "text")
    val got = TextOps.chunk(docs, "doc_id", "text", window = 40, stride = 30)
      .select("doc_id", "chunk_id", "start", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().sorted
    // n=100: the third chunk [60,100) reaches the end — no redundant
    // 4th start at 90 (it would only re-emit tokens 90..99)
    val want = Array(
      (1L, 0L, 0L, 1L),
      (2L, 0L, 0L, 39L),
      (3L, 0L, 0L, 40L),
      (4L, 0L, 0L, 40L), (4L, 1L, 30L, 11L),
      (5L, 0L, 0L, 40L), (5L, 1L, 30L, 40L), (5L, 2L, 60L, 40L))
    assert(got === want)
  }

  test("chunk: every token is covered and interior overlap = window - stride") {
    import spark.implicits._
    val n = 137
    val docs = Seq(doc(1, n)).toDF("doc_id", "text")
    val chunks = TextOps.chunk(docs, "doc_id", "text", window = 40, stride = 30)
      .select("start", "n_chunk_tokens").as[(Long, Long)].collect().sortBy(_._1)
    // coverage: union of [start, start+len) is exactly [0, n)
    val covered = chunks.flatMap { case (s, l) => s until (s + l) }.distinct.sorted
    assert(covered === (0L until n.toLong).toArray)
    // consecutive chunks overlap by 10 tokens except after the cut tail
    chunks.sliding(2).foreach { case Array((s1, l1), (s2, _)) =>
      assert(s2 === s1 + 30)
      assert(s1 + l1 - s2 === (if (l1 == 40) 10L else l1 - 30))
    case _ => ()
    }
  }

  test("ngrams: fewer than k words yields empty, k+ yields n-k+1 grams") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.ngrams(TextOps.words(col("text")), 3).as("g"))
    val got = df.select(col("doc_id"), col("g")).as[(Long, Seq[String])]
      .collect().sortBy(_._1)
    assert(got(0)._2 === Seq.empty)
    assert(got(1)._2 === Seq("a b c"))
    assert(got(2)._2 === Seq("a b c", "b c d"))
  }

  test("globalRowNumber: matches a bare row_number window and is partitioning-independent") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = (1L to 500L).map(i => (i, (i * 7919) % 97)).toDF("id", "key")
    val want = base
      .withColumn("pos", row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "key", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    for (np <- Seq(1, 7, 32)) {
      val got = graft.operators.Enumerate
        .globalRowNumber(base.repartition(np), "pos", col("key"), col("id"))
        .select("id", "key", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(got === want, s"input partitions = $np")
    }
  }

  test("globalRunningSum: matches a bare cumsum window and is partitioning-independent") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = (1L to 500L).map(i => (i, (i * 7919) % 97, (i * 31) % 11 + 1))
      .toDF("id", "key", "v")
    val want = base
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("key"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "key", "v", "cum").as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    for (np <- Seq(1, 7, 32)) {
      val got = graft.operators.Enumerate
        .globalRunningSum(base.repartition(np), "v", "cum", col("key"), col("id"))
        .select("id", "key", "v", "cum").as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got === want, s"input partitions = $np")
    }
  }

  test("globalRunningSum: NULL values contribute 0, matching SQL sum()") {
    import spark.implicits._
    val base = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 7L), (4L, null), (5L, 1L))
      .toDF("id", "v")
    val got = graft.operators.Enumerate
      .globalRunningSum(base.repartition(3), "v", "cum", col("id"))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got === Array((1L, 5L), (2L, 5L), (3L, 12L), (4L, 12L), (5L, 13L)))
  }

  test("decontaminate: distinct shared grams counted, clean docs kept at 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e", "bench"),    // benchmark doc
      (2L, "x a b c y a b c", "tr"), // shares 'a b c' (once, distinct)
      (3L, "b c d q c d e", "tr"),   // shares 'b c d' and 'c d e'
      (4L, "z z z z z", "tr"))       // clean
      .toDF("doc_id", "text", "kind")
    val got = TextOps.decontaminate(docs, "doc_id", "text",
        col("kind") === "bench", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((2L, 1L, 1L), (3L, 2L, 1L), (4L, 0L, 0L)))
  }

  test("decontaminateBloom equals the exact plan (no false negatives)") {
    import spark.implicits._
    // seeded corpus over a small vocabulary → plenty of shared grams
    def text(seed: Int, n: Int) =
      (0 until n).map(i => s"w${(seed * (i + 3) + i * i) % 17}").mkString(" ")
    val docs = (1L to 60L).map(id =>
        (id, text(id.toInt, 20 + (id % 7).toInt), if (id <= 10) "bench" else "tr"))
      .toDF("doc_id", "text", "kind")
    val exact = TextOps.decontaminate(docs, "doc_id", "text",
        col("kind") === "bench", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // a contaminated doc must exist or the test proves nothing
    assert(exact.exists(_._3 == 1L))
    for (fpp <- Seq(0.5, 0.03)) { // high fpp = many bloom survivors; same rows
      val bloomed = TextOps.decontaminateBloom(docs, "doc_id", "text",
          col("kind") === "bench", k = 3, expectedItems = 1024, fpp = fpp)
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(bloomed === exact, s"fpp=$fpp")
    }
  }

  test("adjacentPairs: order kept, duplicates kept, underflow to []") {
    import spark.implicits._
    val got = Seq((1L, "a b b a"), (2L, "one"), (3L, ""), (4L, "x y"))
      .toDF("id", "t")
      .select(col("id"), TextOps.adjacentPairs(TextOps.words(col("t"))).as("p"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(got(0)._2 === Seq("a b", "b b", "b a"))
    assert(got(1)._2 === Seq.empty)
    assert(got(2)._2 === Seq.empty)
    assert(got(3)._2 === Seq("x y"))
  }
}
