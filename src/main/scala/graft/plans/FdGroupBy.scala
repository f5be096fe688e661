package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

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
  * SQL.
  *
  * FDs live in [[FdRegistry]], scoped to a relation: a declaration for
  * table t applies only when the determinant AND dependent attributes
  * trace to a relation aliased t in the plan (SubqueryAlias — temp views
  * and FROM aliases both qualify), so `customer.city -> district` cannot
  * leak onto a same-named column of another table. Determinants may be
  * composite (`(orderid, item_no) -> quantity`). Table-key FDs are
  * auto-derived from a declared relational model's primary keys
  * ([[FdRegistry.declarePrimaryKeys]] — the Book Orders model's PKs map
  * 1:1, Assignment5_17.pdf Table 1).
  */
object FdRegistry {

  /** One dependency: within relation `table` ("*" = any relation),
    * `determinants` jointly determine each of `dependents`. */
  private final case class Fd(
      table: String, determinants: Set[String], dependents: Set[String])

  private val fds = mutable.ArrayBuffer.empty[Fd]

  /** Relation-agnostic declaration (applies to any table carrying these
    * attribute names). */
  def declare(determinant: String, dependents: Set[String]): Unit =
    declareFor("*", Set(determinant), dependents)

  /** Relation-scoped declaration with a (possibly composite) determinant. */
  def declareFor(table: String, determinants: Set[String],
      dependents: Set[String]): Unit =
    fds += Fd(table.toLowerCase, determinants.map(_.toLowerCase),
      dependents.map(_.toLowerCase))

  /** Auto-derive key dependencies from a declared model: each table's
    * primary key determines every non-key column. */
  def declarePrimaryKeys(
      schemas: Map[String, StructType], pks: Map[String, Seq[String]]): Unit =
    pks.foreach { case (t, pk) =>
      schemas.get(t).foreach { schema =>
        val deps = schema.fieldNames.map(_.toLowerCase).toSet --
          pk.map(_.toLowerCase)
        if (deps.nonEmpty) declareFor(t, pk.map(_.toLowerCase).toSet, deps)
      }
    }

  /** Name-only closure (wildcard scope) — the convenience surface for
    * relation-agnostic declarations. */
  def dependentsOf(names: Set[String]): Set[String] =
    closure(names.map(n => (n, Set.empty[String]))).map(_._1)

  /** Closure of attribute names derivable from `grouped`, where each
    * attribute name carries the set of relation aliases it traces to.
    * An FD fires when all its determinants are known within its table
    * scope; its dependents become known in that same scope. */
  def closure(grouped: Set[(String, Set[String])]): Set[(String, String)] = {
    // known: (attrName, tableScope) — "*"-scoped FDs match any table
    def scopesOf(name: String, known: Set[(String, Set[String])]): Set[String] =
      known.collect { case (n, ts) if n == name => ts }.flatten

    var known: Set[(String, Set[String])] =
      grouped.map { case (n, ts) => (n.toLowerCase, ts.map(_.toLowerCase)) }
    val derived = mutable.Set.empty[(String, String)]
    var grown = true
    while (grown) {
      grown = false
      fds.foreach { fd =>
        val applies = fd.determinants.forall { det =>
          val nameKnown = known.exists(_._1 == det)
          // "*" FDs need only the name (DataFrame-API plans carry no
          // aliases); table-scoped FDs need the attr traced to the table
          if (fd.table == "*") nameKnown
          else scopesOf(det, known).contains(fd.table)
        }
        if (applies) {
          fd.dependents.foreach { dep =>
            val entry = (dep, fd.table)
            if (!derived.contains(entry)) {
              derived += entry
              known += ((dep, Set(fd.table)))
              grown = true
            }
          }
        }
      }
    }
    derived.toSet
  }

  def clear(): Unit = fds.clear()
}

case class FdGroupByRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Relation aliases (temp view names, FROM aliases) whose subtree
    * produces attribute `a` — resolution-time plans still carry
    * SubqueryAlias nodes (EliminateSubqueryAliases runs in the
    * optimizer). */
  private def aliasesOf(a: Attribute, plan: LogicalPlan): Set[String] =
    plan.collect {
      case sa: SubqueryAlias if sa.outputSet.contains(a) =>
        sa.identifier.name.toLowerCase
    }.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if agg.childrenResolved && groupingExprs.forall(_.resolved) =>
      val groupedAttrs: Set[(String, Set[String])] = groupingExprs.collect {
        case a: Attribute => (a.name.toLowerCase, aliasesOf(a, child))
      }.toSet
      val groupedNames = groupedAttrs.map(_._1)
      val derivable = FdRegistry.closure(groupedAttrs)
      if (derivable.isEmpty) agg
      else {
        var changed = false
        def fdDerived(a: Attribute): Boolean =
          !groupedNames.contains(a.name.toLowerCase) &&
            derivable.exists { case (dep, scope) =>
              dep == a.name.toLowerCase &&
                (scope == "*" || aliasesOf(a, child).contains(scope))
            }
        val fixed: Seq[NamedExpression] = aggExprs.map {
          case a: AttributeReference if fdDerived(a) =>
            changed = true
            Alias(new First(a).toAggregateExpression(), a.name)()
          // SQL `SELECT dep AS x` arrives as an Alias over the attribute
          case al @ Alias(a: AttributeReference, name) if fdDerived(a) =>
            changed = true
            Alias(new First(a).toAggregateExpression(), name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case other => other
        }
        if (changed) agg.copy(aggregateExpressions = fixed) else agg
      }
  }
}
