package graft.operators

import org.apache.spark.sql.DataFrame

/** NATURAL JOIN with PostgreSQL's semantics: equi-join on *all* same-named
  * columns, common columns emitted once (left copy). The reference workload
  * uses NATURAL JOIN for every join (SURVEY §2.3) — including the fragile
  * cases where the key set silently includes non-key columns (View2 ⋈
  * customer joins on {customerid, f_name, l_name}; proof:
  * assignment-5.md:772–773) and where zero common columns degrade to a
  * cross join (perc_of_ord build, assignment-5.sql:259–263; SURVEY §7.5/7.7).
  *
  * The common-column set is computed explicitly so tests can lock it.
  * Spark SQL also parses NATURAL JOIN; this operator exists so the DataFrame
  * surface has the same semantics without SQL strings, and so the cross-join
  * degradation is explicit (`crossJoin`) rather than rejected.
  */
object NaturalJoin {

  def commonColumns(a: DataFrame, b: DataFrame): Seq[String] = {
    val bCols = b.columns.map(_.toLowerCase).toSet
    a.columns.filter(c => bCols.contains(c.toLowerCase)).toSeq
  }

  def natural(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = commonColumns(a, b)
    if (keys.isEmpty) a.crossJoin(b) // PG's silent degradation, made explicit
    else a.join(b, keys)
  }

  implicit class NaturalJoinOps(private val a: DataFrame) extends AnyVal {
    def naturalJoin(b: DataFrame): DataFrame = natural(a, b)
  }
}
