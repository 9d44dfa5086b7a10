package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of corpus-scale dedup. Candidate-pair operators (Dedup
  * .minhashCandidatePairs, jaccardBlockedPairs, the SimHash buckets)
  * only assert "these two are near-dups"; keeping ONE representative
  * per duplicate GROUP needs the transitive closure: A~B and B~C put
  * {A,B,C} in one cluster even when A and C share no band. The
  * reference has no analogue (its corpus is one video), but any
  * training-data pipeline built on these operators does.
  *
  * Algorithm: iterative min-label propagation. Every node starts as
  * its own component (comp = id); each round every node takes the min
  * of its own label and its neighbors' labels; fixpoint ⟺ every node
  * carries the component-minimum id. Rounds = component diameter,
  * which for near-dup clusters (dense cliques of rewrites of one
  * document, glued by shared shingles) is small — single digits in
  * practice. Per round the shuffled payload is only (id, comp) longs
  * plus the (a, b) edge list: the checkpoint keeps each round's
  * lineage O(1), so 100 TB of *text* never re-enters the loop — the
  * loop sees just the integer graph. A convergence count per round is
  * one cheap action on the just-materialized labels. For adversarial
  * long-chain graphs (diameter ~ n) the two-phase star contractions
  * (large-star/small-star, Kiveris et al., "Connected Components in
  * MapReduce and Beyond") converge in O(log² n) rounds instead; dedup
  * graphs are never chains, so propagation's simpler rounds win here.
  */
object Components {

  /** The block-manager RDD behind a localCheckpoint'd plan, so a
    * superseded round's snapshot can be unpersisted instead of staying
    * pinned for the life of the job (maxIter (id, comp) snapshots on a
    * large graph otherwise). */
  private def checkpointRdd(df: DataFrame) =
    df.queryExecution.logical.collectFirst { case l: LogicalRDD => l.rdd }

  /** `nodes`: one row per node (`id`: long, must include isolated
    * nodes); `edges`: undirected pairs (`id_a`, `id_b`). Returns
    * (id, comp) with comp = min node id of the component. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // symmetrize once; reused every round — checkpoint, not recompute
    // (the edge derivation upstream may be a whole LSH pipeline)
    val sym = edges.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(edges.select(col("id_b").as("a"), col("id_a").as("b")))
      .localCheckpoint()
    // only edge-connected nodes can ever change label — the loop runs
    // on that subgraph (for dedup graphs a sliver of the corpus) and
    // the singleton majority joins back once at the end
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIter) {
      val nb = sym
        .join(labels.select(col("id").as("b"), col("comp").as("nbcomp")), Seq("b"))
        .groupBy(col("a")).agg(min(col("nbcomp")).as("ncomp"))
      // lazy checkpoint: the convergence count below is the action
      // that materializes this round's blocks — one job per round, not
      // an eager-checkpoint job plus a count job
      val next = labels
        .join(nb.withColumnRenamed("a", "id"), Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp2"))
        .localCheckpoint(eager = false)
      changed = next.filter(col("comp2") < col("comp")).count()
      // `next` is materialized (eager checkpoint + the count above) and
      // no longer reads `labels` — drop the superseded round's blocks
      checkpointRdd(labels).foreach(_.unpersist(blocking = false))
      labels = next.select(col("id"), col("comp2").as("comp"))
      round += 1
    }
    if (changed != 0) {
      // diameter > maxIter — a chain-like graph propagation was never
      // meant for. Switch to the O(log² n) star contraction instead of
      // failing; `sym` is already checkpointed, so the handoff reads
      // integers, not the upstream LSH pipeline.
      checkpointRdd(labels).foreach(_.unpersist(blocking = false))
      val starL = starLabels(
        sym.filter(col("a") < col("b")).select(col("b").as("u"), col("a").as("v")))
      val out = nodes.select(col("id"))
        .join(starL, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
        .localCheckpoint()
      checkpointRdd(starL).foreach(_.unpersist(blocking = false))
      checkpointRdd(sym).foreach(_.unpersist(blocking = false))
      return out
    }
    val out = nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .localCheckpoint()
    // the node join-back is the last reader of the loop state and the
    // reused symmetric edge list — release both
    checkpointRdd(labels).foreach(_.unpersist(blocking = false))
    checkpointRdd(sym).foreach(_.unpersist(blocking = false))
    out
  }

  /** Large-star round (Kiveris et al. §3): every node attaches its
    * LARGER neighbors to the minimum of its closed neighborhood.
    * Edges arrive and leave canonically oriented (u > v). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
    val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    sym.filter(col("b") > col("a")).join(mins, "a")
      .select(col("b").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Small-star round: every node bundles its SMALLER neighbors (and
    * itself) onto their minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .select(explode(array(
        struct(col("u").as("x"), col("m").as("y")),
        struct(col("v").as("x"), col("m").as("y")))).as("p"))
      .select(col("p.x").as("u"), col("p.y").as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Alternating large-star/small-star contraction to the star
    * fixpoint: every edge-connected node ends up pointing directly at
    * its component minimum in O(log² n) rounds regardless of diameter
    * (vs diameter rounds for propagation). Input: canonical (u > v)
    * edge pairs. Returns (id, comp) for every edge-connected node. */
  private def starLabels(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    var e = pairs.filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // set-equality fixpoint check: two cheap anti-joins on integer
      // pairs (the first count is also what materializes `next`)
      stable = next.exceptAll(e).count() == 0 && e.exceptAll(next).count() == 0
      checkpointRdd(e).foreach(_.unpersist(blocking = false))
      e = next
      round += 1
    }
    require(stable, s"starLabels: no fixpoint after $maxRounds rounds")
    // at the fixpoint the edge set IS the labeling: (u → component
    // min) stars, centers labeling themselves
    val out = e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      .localCheckpoint()
    checkpointRdd(e).foreach(_.unpersist(blocking = false))
    out
  }

  /** Standalone star-contraction components — same contract as
    * [[connectedComponents]], for callers that KNOW the graph is
    * chain-like (diameter ≫ log n). */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val pairs = edges
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
    val starL = starLabels(pairs, maxRounds)
    val out = nodes.select(col("id"))
      .join(starL, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .localCheckpoint()
    checkpointRdd(starL).foreach(_.unpersist(blocking = false))
    out
  }

  /** Dedup clustering: components of the near-dup graph plus cluster
    * size and the keep flag (representative = min doc id). Isolated
    * docs are singleton clusters of themselves. */
  def dedupClusters(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val comp = connectedComponents(nodes, edges)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_n"))
    comp.join(sizes, Seq("comp"))
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        col("cluster_n"), (col("id") === col("comp")).cast("int").as("keep"))
  }
}
