package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

/** Connected-components clustering: closure over explicit graphs. */
class ComponentsSpec extends SparkSpec {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain closes transitively to the minimum id") {
    // 5—4—3—2—1 plus isolated 0: the min label must walk the chain
    val comp = run(0L to 5L, Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(comp === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two cliques and a bridge-free pair stay separate components") {
    val comp = run(0L to 6L,
      Seq((0L, 1L), (1L, 2L), (0L, 2L), // clique {0,1,2}
          (3L, 4L),                     // pair {3,4}
          (5L, 6L)))                    // pair {5,6}
    assert(comp === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
  }

  test("dedupClusters sizes, representative flag, singleton clusters") {
    import spark.implicits._
    val out = Components.dedupClusters(
        (0L to 4L).toDF("id"),
        Seq((1L, 3L), (3L, 4L)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out === Seq(
      (0L, 0L, 1L, 1), (1L, 1L, 3L, 1), (2L, 2L, 1L, 1),
      (3L, 1L, 3L, 0), (4L, 1L, 3L, 0)))
  }

  test("maxIter exhaustion on a long chain falls back to star contraction (no failure)") {
    import spark.implicits._
    // a 300-node chain has diameter 299 ≫ maxIter=8 — propagation
    // cannot finish; the star fallback must close it to comp=0 anyway
    val n = 300
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val comp = Components.connectedComponents(
        (0L until n.toLong).toDF("id"), edges.toDF("id_a", "id_b"), maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === (0L until n.toLong).map(_ -> 0L).toMap)
  }

  test("star contraction converges in O(log² n) rounds on the adversarial chain") {
    import spark.implicits._
    // direct star path with a tight round budget: 300-node chain,
    // diameter 299, must converge well within 20 alternating rounds
    // (propagation would need 299) — the budget IS the assertion
    val n = 300
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val comp = Components.connectedComponentsStar(
        (0L until n.toLong).toDF("id"), edges.toDF("id_a", "id_b"), maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === (0L until n.toLong).map(_ -> 0L).toMap)
  }

  test("star contraction matches propagation on a mixed random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 150
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val viaProp = run(0L until n map (_.toLong), edges)
    val viaStar = Components.connectedComponentsStar(
        (0L until n.toLong).toDF("id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaProp)
  }

  test("propagation matches a driver-side union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    // find() compresses to the min id only if roots are min — union by
    // min above guarantees the root IS the component minimum
    assert(run(0L until n map (_.toLong), edges) === expect)
  }
}
