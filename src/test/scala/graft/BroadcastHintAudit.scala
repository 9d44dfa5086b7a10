package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, CaseWhen, Cast, Expression, Least, Literal, Pmod, Remainder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  *    construction-bounded key EXPRESSIONS (see [[boundedGroupKey]])
  *    it is ≤ that key cardinality; over an already-bounded input it
  *    can only shrink;
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
  *
  * Grouping-key boundedness is proven from the EXPRESSION, not the
  * attribute NAME (round-15 verdict task 3 — the r15 gate accepted
  * any column merely NAMED "b"/"lang"/"bucket", so a corpus-sized
  * frame grouped by `doc_id AS lang` slipped past). Each grouping
  * attribute is CHASED through the subtree's alias chain to its
  * defining expression, then proven bounded structurally:
  *  - `x % k` / `pmod(x, k)` with literal k ≤ 65536 → ≤ 2k−1 values;
  *  - CASE whose every output branch is a literal → ≤ #branches;
  *  - a literal → 1 value;
  *  - a RAW SCAN COLUMN (the chase ends at an attribute the subtree's
  *    file scans themselves output — renames never qualify, because
  *    the chase resolves them to the origin column's real name) whose
  *    name is in [[generatorBoundedScanKeys]], each with its written
  *    data-vintage bound.
  */
object BroadcastHintAudit {

  /** RAW scan columns whose cardinality is bounded by the data
    * generator's construction (not by data volume), each with the
    * written bound. Only an attribute that chases back to a file
    * scan's own output under this name qualifies — a rename like
    * `doc_id AS lang` resolves to "doc_id" and fails. */
  val generatorBoundedScanKeys: Map[String, String] = Map(
    "lang" -> "generator language codes: fixed small vocabulary (≤~30)",
    "event_type" -> "5 event types by generator construction")

  /** Largest `% k` modulus accepted as a bound: big enough for every
    * deliberate bucket scheme in the repo (≤128), far below anything
    * that could smuggle a corpus-sized frame through. */
  private val MaxModulus = 65536L

  private val dimensionLeaf = """(region|nation)\.parquet""".r

  /** exprId → aliased child expression, from every aliasing node in
    * the subtree (Project + Aggregate output lists cover the repo's
    * plans; Window expressions alias aggregates, which are never
    * bounded keys, so they are deliberately not chased). */
  private def aliasMap(p: LogicalPlan): Map[Long, Expression] = {
    val m = Map.newBuilder[Long, Expression]
    p.foreach {
      case pr: Project =>
        pr.projectList.foreach {
          case a: Alias => m += (a.exprId.id -> a.child)
          case _ => ()
        }
      case ag: Aggregate =>
        ag.aggregateExpressions.foreach {
          case a: Alias => m += (a.exprId.id -> a.child)
          case _ => ()
        }
      case _ => ()
    }
    m.result()
  }

  /** exprIds the subtree's FILE SCANS output — the chase's terminal
    * set for data-vintage keys. */
  private def scanAttrIds(p: LogicalPlan): Set[Long] =
    p.collect { case lr: LogicalRelation => lr.output.map(_.exprId.id) }
      .flatten.toSet

  /** Follow `e` through the alias chain to its defining expression
    * (depth-capped against pathological cycles). */
  private def chase(e: Expression, am: Map[Long, Expression], depth: Int = 0)
      : Expression = e match {
    case _ if depth > 32 => e
    case a: Alias => chase(a.child, am, depth + 1)
    case c: Cast => chase(c.child, am, depth + 1)
    case ar: AttributeReference if am.contains(ar.exprId.id) =>
      chase(am(ar.exprId.id), am, depth + 1)
    case other => other
  }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case _ => None
  }

  /** Structural boundedness of one grouping expression, AFTER the
    * alias chase. */
  private def boundedGroupKey(e: Expression, am: Map[Long, Expression],
      scanIds: Set[Long]): Boolean = chase(e, am) match {
    case _: Literal => true
    case Remainder(_, k, _) => intLit(chase(k, am)).exists(v =>
      v > 0 && v <= MaxModulus)
    case Pmod(_, k, _) => intLit(chase(k, am)).exists(v =>
      v > 0 && v <= MaxModulus)
    case cw: CaseWhen =>
      cw.branches.forall(_._2.isInstanceOf[Literal]) &&
        cw.elseValue.forall(_.isInstanceOf[Literal])
    // least(k, x) with literal k bounds one side only — NOT accepted;
    // q273-style derived buckets carry a per-query whitelist entry
    case _: Least => false
    case ar: AttributeReference =>
      scanIds.contains(ar.exprId.id) &&
        generatorBoundedScanKeys.contains(ar.name)
    case _ => false
  }

  private def leafBounded(l: LeafNode): Boolean = l match {
    case _: OneRowRelation => true
    case _: LocalRelation => true // literal arrays / collected ≤k seeds
    case _: Range => true // only literal-bounded ranges exist in the repo
    case lr: LogicalRelation =>
      // LogicalRelation.toString hides the path; read the file index
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.nonEmpty && fs.location.rootPaths
            .forall(p => dimensionLeaf.findFirstIn(p.toString).isDefined)
        case _ => false
      }
    case _ => false
  }

  def bounded(p: LogicalPlan): Boolean = {
    val am = aliasMap(p)
    val scanIds = scanAttrIds(p)
    def keyOk(e: Expression): Boolean = boundedGroupKey(e, am, scanIds)
    def go(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate =>
        a.groupingExpressions.isEmpty ||
          a.groupingExpressions.forall(keyOk) ||
          go(a.child)
      case d: Deduplicate => d.keys.forall(keyOk) || go(d.child)
      case j: Join => go(j.left) && go(j.right)
      case _: Generate => false // explode expands: needs a written bound
      case u: Union => u.children.forall(go)
      case l: LeafNode => leafBounded(l)
      case o if o.children.size == 1 => go(o.children.head)
      case _ => false
    }
    go(p)
  }

  /** Broadcast-ish hints in `plan` whose subtree has no structural
    * bound proof. The caller whitelists survivors with written bounds.
    *
    * SHUFFLE-strategy hints (SHUFFLE_HASH / SHUFFLE_MERGE) are exempt
    * from the bound proof: the cliff this gate exists for is the
    * DRIVER-side build a broadcast hint forces at any size, and a
    * shuffled join has no driver build — its per-partition hash map is
    * bounded by (side bytes / shuffle partitions), which scales down
    * as partition count scales with input (the round-16 wedge-join
    * hints rely on exactly this). SHUFFLE_REPLICATE_NL is NOT exempt
    * (it replicates a whole side — the cartesian cliff), and an
    * unstrategied hint stays conservative. */
  def unprovenHints(plan: LogicalPlan): Seq[ResolvedHint] = {
    val shuffleSafe: Set[JoinStrategyHint] = Set(SHUFFLE_HASH, SHUFFLE_MERGE)
    plan.collect {
      case h: ResolvedHint
          if !h.hints.strategy.exists(shuffleSafe) && !bounded(h.child) => h
    }
  }
}
