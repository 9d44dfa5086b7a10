package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Pins the z-order layout key: interleave correctness against the
  * Scala kernel, the SQL mirror's term-for-term equivalence, and the
  * property the layout buys — contiguous z ranges bound BOTH dims. */
class LayoutSpec extends SparkSpec {

  test("zValue matches the bit-interleave kernel across the domain") {
    import spark.implicits._
    // corner + pseudo-random coordinates, 8-bit domain
    val pts = Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L), (1L, 2L)) ++
      (0 until 200).map(i => ((i * 7919L) % 256, (i * 104729L) % 256))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), bits = 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === Layout.zValueKernel(x, y, 8), s"($x, $y)")
    }
  }

  test("zValue kernel: interleave basics and monotone range") {
    // x occupies even bits, y odd: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert(Layout.zValueKernel(1, 0, 8) === 1L)
    assert(Layout.zValueKernel(0, 1, 8) === 2L)
    assert(Layout.zValueKernel(3, 3, 8) === 15L)
    assert(Layout.zValueKernel(255, 255, 8) === 65535L)
    // z is a bijection [0,256)² → [0,65536)
    val all = for (x <- 0L until 64; y <- 0L until 64)
      yield Layout.zValueKernel(x, y, 6)
    assert(all.distinct.size === 64 * 64)
  }

  test("contiguous z ranges bound both dims (the pruning property)") {
    // every aligned 2^(2k) z block is a 2^k × 2^k square: an aligned
    // 64-value block spans ≤ 8 in x AND y — a (x, y)-sorted layout
    // gives y spans of the whole domain inside every x run
    val byBlock = (for (x <- 0L until 256; y <- 0L until 256)
      yield (Layout.zValueKernel(x, y, 8) >> 6, x, y))
      .groupBy(_._1)
    byBlock.foreach { case (b, pts) =>
      val xs = pts.map(_._2); val ys = pts.map(_._3)
      assert(xs.max - xs.min <= 7, s"block $b x-span")
      assert(ys.max - ys.min <= 7, s"block $b y-span")
    }
  }

  test("zorderBy: output partitions cover disjoint contiguous z ranges") {
    import spark.implicits._
    val df = (0 until 2048).map(i => ((i * 7919L) % 256, (i * 104729L) % 256))
      .toDF("x", "y")
    val parts = Layout.zorderBy(df, col("x"), col("y"), bits = 8)
      .select(col("z"))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else Iterator((pid, zs.min, zs.max, zs.sameElements(zs.sorted)))
      }.collect().sortBy(_._1)
    assert(parts.nonEmpty)
    parts.foreach { case (pid, _, _, sortedWithin) =>
      assert(sortedWithin, s"partition $pid not z-sorted")
    }
    // ranges are disjoint and ordered across partitions
    parts.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) => assert(max1 <= min2)
      case _ =>
    }
  }
}
