package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY.md §4 optimization 4: rewrite `Filter(NOT attr IN (<large literal
  * list>))` — the stop-word-filter shape — into a broadcast left-anti join
  * against a LocalRelation of the list values.
  *
  * Rationale: a multi-thousand-entry IN list (the reference ships ~800 stop
  * words, FinalReport2.doc) compiles into a huge per-row predicate; as an
  * anti-join the list becomes a broadcast hash table probe and the optimizer
  * can push/reorder it like any join. Semantics are preserved exactly:
  * NOT IN drops null probes, so the join child gains an IsNotNull filter
  * (no nulls exist in the literal lists this engine generates; lists
  * containing null literals are left untouched).
  *
  * Activate per session via `GraftExtensions.register` (adds it to
  * `spark.experimental.extraOptimizations`) or the spark.sql.extensions
  * config.
  */
object LargeNotInListToAntiJoin extends Rule[LogicalPlan] {

  /** Below this size the per-row predicate is cheaper than a join. */
  val threshold = 16

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Filter(Not(In(attr: Attribute, list)), child)
        if list.size > threshold && list.forall {
          case Literal(v, dt) => v != null && dt == attr.dataType
          case _ => false
        } =>
      rewrite(child, attr, list.map(_.asInstanceOf[Literal].value))

    case Filter(Not(InSet(attr: Attribute, hset)), child)
        if hset.size > threshold && !hset.contains(null) =>
      rewrite(child, attr, hset.toSeq)
  }

  private def rewrite(child: LogicalPlan, attr: Attribute, values: Seq[Any]): LogicalPlan = {
    val listAttr = AttributeReference("_graft_not_in", attr.dataType, nullable = false)()
    val rows = values.distinct.map(v => InternalRow(v))
    Join(
      Filter(IsNotNull(attr), child), // NOT IN drops null probes; anti join would keep them
      LocalRelation(Seq(listAttr), rows),
      LeftAnti,
      Some(EqualTo(attr, listAttr)),
      // post-optimizer rewrite: the hint must ride on the Join itself
      JoinHint(leftHint = None, rightHint = Some(HintInfo(strategy = Some(BROADCAST)))))
  }
}
