package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-time constraint validation — Spark enforces no PK/FK/CHECK, so
  * the engine asserts them as data-quality checks (SURVEY §1 mapping:
  * "PK/unique -> groupBy-count assertion, CHECK/NOT NULL -> validation,
  * FK -> anti-join containment"). Each validator returns the violation
  * count (0 = constraint holds); `report` collects a named batch into a
  * single relation for auditing.
  *
  * All checks are single aggregations/anti-joins — shuffle-bounded on the
  * constrained keys, no driver-side iteration.
  */
object Constraints {

  /** PRIMARY KEY / UNIQUE: rows beyond the first per key tuple. */
  def primaryKeyViolations(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L)))
      .collect().head.getLong(0)

  /** NOT NULL over the given columns. */
  def notNullViolations(df: DataFrame, cols: Seq[String]): Long =
    df.filter(cols.map(col(_).isNull).reduce(_ || _)).count()

  /** CHECK constraint: rows where the predicate does NOT hold. */
  def checkViolations(df: DataFrame, predicate: Column): Long =
    df.filter(!predicate || predicate.isNull).count()

  /** FOREIGN KEY containment: child rows with no parent (anti-join). */
  def foreignKeyViolations(
      child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): Long = {
    val cond = childKeys.zip(parentKeys)
      .map { case (c, p) => child(c) === parent(p) }
      .reduce(_ && _)
    child.join(parent, cond, "left_anti").count()
  }

  /** Run a named batch of checks into one (constraint_name, violations)
    * relation. */
  def report(spark: SparkSession, checks: Seq[(String, () => Long)]): DataFrame = {
    import spark.implicits._
    checks.map { case (name, f) => (name, f()) }
      .toDF("constraint_name", "violations")
  }
}
