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

  /** A relation-alias INSTANCE: (alias name, a stable id of that
    * occurrence — the first output exprId). Two sides of a self-join
    * both alias "customer" but are distinct instances; scoping FDs by
    * the name alone would let a determinant from one side unlock a
    * dependent from the other. */
  type Scope = (String, Long)

  /** Name-only closure (wildcard scope) — the convenience surface for
    * relation-agnostic declarations. */
  def dependentsOf(names: Set[String]): Set[String] =
    closure(names.map(n => (n, Set.empty[Scope]))).map(_._1)

  /** Closure of attribute names derivable from `grouped`, where each
    * attribute name carries the relation-alias INSTANCES it traces to.
    * A table-scoped FD fires per instance: all determinants must trace
    * to the SAME instance of its table, and its dependents become known
    * in exactly that instance (None scope = wildcard FD). */
  def closure(grouped: Set[(String, Set[Scope])])
      : Set[(String, Option[Scope])] = {
    var known: Set[(String, Set[Scope])] =
      grouped.map { case (n, ts) => (n.toLowerCase, ts) }
    val derived = mutable.Set.empty[(String, Option[Scope])]
    var grown = true
    while (grown) {
      grown = false
      fds.foreach { fd =>
        if (fd.table == "*") {
          // "*" FDs need only the names (DataFrame-API plans carry no
          // aliases)
          if (fd.determinants.forall(det => known.exists(_._1 == det))) {
            fd.dependents.foreach { dep =>
              val entry = (dep, None)
              if (!derived.contains(entry)) {
                derived += entry
                known += ((dep, Set.empty[Scope]))
                grown = true
              }
            }
          }
        } else {
          // instances of fd.table that EVERY determinant traces to
          val perDet = fd.determinants.map(det =>
            known.filter(_._1 == det).flatMap(_._2)
              .collect { case (t, i) if t == fd.table => i })
          val shared =
            if (perDet.isEmpty || perDet.exists(_.isEmpty)) Set.empty[Long]
            else perDet.reduce(_ intersect _)
          shared.foreach { inst =>
            fd.dependents.foreach { dep =>
              val entry = (dep, Some((fd.table, inst)): Option[Scope])
              if (!derived.contains(entry)) {
                derived += entry
                known += ((dep, Set((fd.table, inst))))
                grown = true
              }
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

  /** Relation-alias INSTANCES (temp view names, FROM aliases — each
    * occurrence identified by its first output exprId) whose subtree
    * produces attribute `a` — resolution-time plans still carry
    * SubqueryAlias nodes (EliminateSubqueryAliases runs in the
    * optimizer). Instance identity is what keeps a self-join's two
    * same-named sides from unlocking each other's FDs. */
  private def aliasesOf(a: Attribute,
      plan: LogicalPlan): Set[FdRegistry.Scope] =
    plan.collect {
      case sa: SubqueryAlias if sa.outputSet.contains(a) =>
        (sa.identifier.name.toLowerCase,
          sa.output.headOption.map(_.exprId.id).getOrElse(0L))
    }.toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if agg.childrenResolved && groupingExprs.forall(_.resolved) =>
      val groupedAttrs: Set[(String, Set[FdRegistry.Scope])] =
        groupingExprs.collect {
          case a: Attribute => (a.name.toLowerCase, aliasesOf(a, child))
        }.toSet
      val groupedNames = groupedAttrs.map(_._1)
      val derivable = FdRegistry.closure(groupedAttrs)
      if (derivable.isEmpty) agg
      else {
        var changed = false
        def fdDerived(a: Attribute): Boolean =
          !groupedNames.contains(a.name.toLowerCase) &&
            derivable.exists {
              case (dep, None) => dep == a.name.toLowerCase
              case (dep, Some(scope)) => dep == a.name.toLowerCase &&
                aliasesOf(a, child).contains(scope)
            }
        val fixed: Seq[NamedExpression] = aggExprs.map {
          case a: AttributeReference if fdDerived(a) =>
            changed = true
            // keep the attribute's exprId: parent operators were already
            // resolved against it in this same Resolution batch — a
            // fresh id would orphan their references
            Alias(new First(a).toAggregateExpression(), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
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
