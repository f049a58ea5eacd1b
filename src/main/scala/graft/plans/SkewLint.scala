package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** One lint finding: a join on a skew-annotated key that AQE's skew
  * handling will SILENTLY decline to fix, plus the remediation the
  * round-10 probe measured (SCALING.md "AQE skew-join vs the manual
  * salt"). */
case class SkewFinding(key: String, message: String)

/** Plan lint for the quiet AQE-skew trap the round-10 probe adjudicated:
  * `OptimizeSkewedJoin` pattern-matches ONLY
  * `SMJ(Sort(ShuffleRead), Sort(ShuffleRead))` — an in-plan aggregate
  * feeding one side of the join (the COMMON dim shape: `groupBy.agg`
  * straight into the join) sits between its exchange and the join and
  * disqualifies the whole join from skew splitting, with no warning from
  * Spark. Plain and "AQE on" then measure identical (12.6 vs 12.5 s in
  * the probe) while the user believes AQE covers them.
  *
  * [[check]] walks the OPTIMIZED logical plan and flags every equi join
  * on a caller-annotated hot key where:
  *   - neither side is broadcastable (stats under
  *     `spark.sql.autoBroadcastJoinThreshold`, or an explicit broadcast
  *     hint) — a broadcast-hash join has no skewed shuffle to split;
  *   - one join input IS an aggregation (its subtree root, looking
  *     through projections/filters, is an `Aggregate`) — the shape-B
  *     disqualifier; and
  *   - no ancestor aggregation groups on the same key — in that shape
  *     (probe shape A) splitting is vetoed by the downstream partitioning
  *     REQUIREMENT itself, so materializing the dim would not recover
  *     AQE either (`forceOptimizeSkewedJoin` included); the join is
  *     intentionally exchange-reusing and the only lever is
  *     [[graft.operators.Skew.saltedJoin]], a design choice the lint
  *     must not second-guess on every such plan.
  *
  * The remediation message carries the probe's measured rule of thumb:
  * materialize the dim side (checkpoint/table) so AQE can split the fact
  * side — 4.5× over plain in shape C — or salt when the dim must stay
  * in-plan. Skew cannot be detected statically from a local test frame,
  * so the hot keys are ANNOTATED by the caller (the same contract as
  * `Skew.saltedJoin`'s explicit key).
  */
object SkewLint {

  /** Lint `df`'s plan for joins on `skewKeys` (column names, case
    * sensitive; an equi pair is hot when EITHER side's attribute name is
    * annotated, so `fact.user_id = dim.uid` is caught by annotating either
    * `user_id` or `uid`) that AQE skew handling cannot fix. Empty result = every
    * annotated join is either broadcastable, skew-splittable (bare
    * shuffle children), or deliberately exchange-reusing (same-key
    * downstream aggregate). */
  def check(df: DataFrame, skewKeys: Set[String]): Seq[SkewFinding] = {
    val conf = df.sparkSession.sessionState.conf
    val threshold = conf.autoBroadcastJoinThreshold
    val plan = df.queryExecution.optimizedPlan
    val out = scala.collection.mutable.ListBuffer.empty[SkewFinding]

    // the subtree root, looking through row-preserving ops, is an
    // aggregation: physically that aggregate sits between the side's
    // exchange and the join, which is exactly what breaks the
    // OptimizeSkewedJoin pattern
    def rootIsAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case Project(_, child) => rootIsAggregate(child)
      case Filter(_, child) => rootIsAggregate(child)
      case _ => false
    }

    def broadcastable(p: LogicalPlan, hinted: Boolean): Boolean =
      hinted || (threshold > 0 && p.stats.sizeInBytes <= threshold)

    // every equi pair, BOTH side names kept: a hot join on differently-named
    // columns (fact.user_id = dim.uid) must still be flagged when EITHER
    // side's name is annotated, and the same-key-downstream suppression must
    // recognize a downstream groupBy on either alias of the join key
    // (ADVICE r11)
    def equiKeyPairs(cond: Option[Expression]): Seq[(String, String)] =
      cond.toSeq.flatMap(_.collect {
        case EqualTo(l: AttributeReference, r: AttributeReference) => (l.name, r.name)
      })

    def hasBroadcastHint(h: HintInfo): Boolean =
      h.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)

    def visit(node: LogicalPlan, aggAbove: Set[String]): Unit = {
      node match {
        case j: Join =>
          val hot = equiKeyPairs(j.condition)
            .filter { case (l, r) => skewKeys(l) || skewKeys(r) }
            .filterNot { case (l, r) => aggAbove(l) || aggAbove(r) }
            .map { case (l, r) => if (skewKeys(l)) l else r }
            .distinct
          for (k <- hot) {
            val leftBc = broadcastable(j.left, j.hint.leftHint.exists(hasBroadcastHint))
            val rightBc = broadcastable(j.right, j.hint.rightHint.exists(hasBroadcastHint))
            if (!leftBc && !rightBc &&
                (rootIsAggregate(j.left) || rootIsAggregate(j.right)))
              out += SkewFinding(k,
                s"join on skewed key '$k' has an in-plan aggregate on one input: " +
                  "OptimizeSkewedJoin only matches SMJ over two bare shuffle reads, so " +
                  "AQE will NOT split the hot partition (SCALING.md round-10 probe, shape B). " +
                  "Materialize the aggregated side (localCheckpoint/table) so AQE can split " +
                  "the fact side, or use Skew.saltedJoin if the dim must stay in-plan.")
          }
        case _ => ()
      }
      val aggAboveNext = node match {
        case a: Aggregate =>
          aggAbove ++ a.groupingExpressions.flatMap(_.collect {
            case ar: AttributeReference => ar.name
          })
        case _ => aggAbove
      }
      node.children.foreach(visit(_, aggAboveNext))
    }

    visit(plan, Set.empty)
    out.toList
  }
}
