package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Functional-dependency GROUP BY — PostgreSQL accepts
  * `GROUP BY pk` while projecting columns the PK determines
  * (the reference leans on this in every best-buyers query:
  * `GROUP BY customer.customerid` selecting f_name/l_name,
  * assignment-5.sql:191–200; SURVEY §2.4 A7 / §4 flags it as the one
  * semantic gap, with this rule as the stretch goal).
  *
  * Spark rejects those plans at analysis check (MISSING_GROUP_BY /
  * MISSING_AGGREGATION). This resolution rule runs after resolution but
  * before the check: any bare projected attribute that a declared FD
  * derives from the grouping keys is wrapped in `first(attr)` — exactly
  * the rewrite the engine's queries apply by hand, now available to raw
  * SQL. FDs are declared per attribute name in [[FdRegistry]]
  * (determinant -> dependents), e.g. customerid -> {f_name, l_name} and
  * the reference's City -> District -> Country chain.
  */
object FdRegistry {
  /** determinant attribute name (lowercase) -> dependent attribute names. */
  private val fds = mutable.Map.empty[String, Set[String]]

  def declare(determinant: String, dependents: Set[String]): Unit =
    fds(determinant.toLowerCase) =
      fds.getOrElse(determinant.toLowerCase, Set.empty) ++
        dependents.map(_.toLowerCase)

  def dependentsOf(determinants: Set[String]): Set[String] = {
    // transitive closure: City -> District -> Country
    var known = determinants.map(_.toLowerCase)
    var grown = true
    while (grown) {
      val next = known ++ known.flatMap(d => fds.getOrElse(d, Set.empty))
      grown = next.size != known.size
      known = next
    }
    known -- determinants.map(_.toLowerCase)
  }

  def clear(): Unit = fds.clear()
}

case class FdGroupByRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if agg.childrenResolved && groupingExprs.forall(_.resolved) =>
      val groupedAttrs: Set[String] = groupingExprs.collect {
        case a: Attribute => a.name.toLowerCase
      }.toSet
      val derivable = FdRegistry.dependentsOf(groupedAttrs)
      if (derivable.isEmpty) agg
      else {
        var changed = false
        val fixed: Seq[NamedExpression] = aggExprs.map {
          case a: AttributeReference
              if !groupedAttrs.contains(a.name.toLowerCase) &&
                derivable.contains(a.name.toLowerCase) =>
            changed = true
            Alias(new First(a).toAggregateExpression(), a.name)()
          case other => other
        }
        if (changed) agg.copy(aggregateExpressions = fixed) else agg
      }
  }
}
