package graft

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** The q173 cliff class, turned into a gate (round-14 verdict task 3):
  * a `broadcast()` HINT forces a driver-side build at ANY size — it
  * ignores `autoBroadcastJoinThreshold` and `maxResultSize` headroom
  * planning — so a hint over a frame whose cardinality grows with the
  * fact tables is a guaranteed memory cliff at some scale factor,
  * invisible at sf0.1 (exactly how q173's broadcast adjacency died at
  * sf30). The round-14 fix hand-swept ~40 hint sites; this classifier
  * makes the sweep a regression gate: every ResolvedHint subtree in a
  * query's ANALYZED plan (hints are absorbed into Join nodes by the
  * optimizer, so the analyzed tree is where they are all still
  * visible) must be PROVABLY bounded, or the query needs a whitelist
  * entry in QueriesSmokeSpec with the written bound.
  *
  * "Provably bounded" is a conservative recursive structural proof:
  *  - a Limit bounds anything below it (≤ k rows);
  *  - an Aggregate with no grouping keys is 1 row; grouped by
  *    construction-bounded keys (the [[boundedKeys]] table, each with
  *    its written bound) it is ≤ that key cardinality; over an
  *    already-bounded input it can only shrink;
  *  - joins/unions of bounded inputs are bounded (hint subtrees only
  *    ever inner-join or cross small things);
  *  - row-preserving/shrinking unary ops (project/filter/sort/window/
  *    distinct/repartition) propagate the child's bound; Generate
  *    (explode) EXPANDS and never propagates — an exploded frame
  *    needs a whitelist entry arguing the array side is bounded;
  *  - leaves: literals (LocalRelation/OneRowRelation/Range) are
  *    bounded; of the parquet tables only region (5 rows) and nation
  *    (25) are scale-free — customer/supplier/part/orders/lineitem/
  *    documents/events/embeddings all grow linearly with SF and are
  *    NEVER broadcast-hintable (AQE may still broadcast them while
  *    genuinely small — that is the point: the ENGINE decides with
  *    size stats, the hint would decide blind).
  */
object BroadcastHintAudit {

  /** Grouping-key names whose cardinality is bounded by CONSTRUCTION
    * (not by data volume), each with the written bound. */
  val boundedKeys: Map[String, String] = Map(
    "lang" -> "generator language codes: fixed small vocabulary (≤~30)",
    "lang_a" -> "rename of lang (q269 pair spine)",
    "lang_b" -> "rename of lang (q269 pair spine)",
    "event_type" -> "5 event types by generator construction",
    "b" -> "q267 hashes tokens into exactly 128 buckets (h % 128)",
    "bucket" -> "q273/q126 bucket ids: h % 64 by construction")

  private val dimensionLeaf = """(region|nation)\.parquet""".r

  private def keyOk(e: Expression): Boolean = e match {
    case a: Attribute => boundedKeys.contains(a.name)
    case _ => false
  }

  private def leafBounded(l: LeafNode): Boolean = l match {
    case _: OneRowRelation => true
    case _: LocalRelation => true // literal arrays / collected ≤k seeds
    case _: Range => true // only literal-bounded ranges exist in the repo
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      // LogicalRelation.toString hides the path; read the file index
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.nonEmpty && fs.location.rootPaths
            .forall(p => dimensionLeaf.findFirstIn(p.toString).isDefined)
        case _ => false
      }
    case _ => false
  }

  def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate =>
      a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall(keyOk) ||
        bounded(a.child)
    case d: Deduplicate => d.keys.forall(keyOk) || bounded(d.child)
    case j: Join => bounded(j.left) && bounded(j.right)
    case _: Generate => false // explode expands: needs a written bound
    case u: Union => u.children.forall(bounded)
    case l: LeafNode => leafBounded(l)
    case o if o.children.size == 1 => bounded(o.children.head)
    case _ => false
  }

  /** Broadcast-ish hints in `plan` whose subtree has no structural
    * bound proof. The caller whitelists survivors with written bounds. */
  def unprovenHints(plan: LogicalPlan): Seq[ResolvedHint] =
    plan.collect { case h: ResolvedHint if !bounded(h.child) => h }
}
