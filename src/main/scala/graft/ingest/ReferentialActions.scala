package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FK referential ACTIONS, executed — the reference declares `ON UPDATE
  * CASCADE / ON DELETE SET DEFAULT / RESTRICT` on its FK web
  * (BookOrdersDatabaseDump_17.sql:1700–1736) but its workload never fires
  * them; this module runs the delete-side actions for real over any child
  * relation, as declarative plans:
  *
  *   - CASCADE:   child rows referencing a deleted parent are deleted —
  *                one anti-join against the deleted-parent key set;
  *   - SET NULL / SET DEFAULT: referencing FK columns are rewritten —
  *                one left join + conditional projection;
  *   - RESTRICT:  the parent delete is refused if any child references
  *                it — one semi-join count (0 = delete may proceed).
  *
  * Scale: every action is a single keyed join against the deleted-parent
  * set; when the deleted set is dimension-sized Catalyst broadcasts it,
  * otherwise it shuffles on the FK — never a scan-per-parent loop.
  */
object ReferentialActions {

  // a child already carrying one of the internal scratch names would be
  // silently clobbered by withColumn and deleted by the final drop —
  // refuse loudly (the Merge.outer guard-column precedent, applied to
  // every public operator that rides scratch columns)
  private def requireNoScratch(child: DataFrame): Unit = {
    val clash = child.columns
      .filter(c => c == "__deleted" || c.startsWith("__ra_"))
    require(clash.isEmpty,
      s"ReferentialActions: column(s) ${clash.mkString(", ")} collide " +
        "with the '__deleted'/'__ra_*' scratch namespace")
  }

  private def fkMatch(child: DataFrame, fk: Seq[String],
      deletedKeys: DataFrame): Column = {
    val pks = deletedKeys.columns
    fk.zip(pks).map { case (c, p) => child(c) === deletedKeys(p) }
      .reduce(_ && _)
  }

  /** ON DELETE CASCADE: the child relation with every row referencing a
    * deleted parent removed. */
  def onDeleteCascade(child: DataFrame, fk: Seq[String],
      deletedKeys: DataFrame): DataFrame =
    child.join(deletedKeys, fkMatch(child, fk, deletedKeys), "left_anti")

  /** ON DELETE SET NULL (SET DEFAULT with a default literal): FK columns
    * of rows referencing a deleted parent are rewritten to `value`.
    * The key relation's columns are renamed into an internal namespace
    * before the join: the reference's FK web names child FK and parent
    * key IDENTICALLY (customerid ⟷ customerid), and a post-join
    * drop(parent key names) would take the child's own FK column with
    * it. */
  def onDeleteSet(child: DataFrame, fk: Seq[String],
      deletedKeys: DataFrame, value: Column): DataFrame = {
    requireNoScratch(child)
    val renamed = deletedKeys.select(
      deletedKeys.columns.toIndexedSeq.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__ra_pk_$i") }: _*)
      .withColumn("__deleted", lit(true))
    val cond = fk.zipWithIndex
      .map { case (c, i) => child(c) === renamed(s"__ra_pk_$i") }
      .reduce(_ && _)
    val marked = child.join(renamed, cond, "left")
      .drop(deletedKeys.columns.indices.map(i => s"__ra_pk_$i"): _*)
    fk.foldLeft(marked) { case (df, c) =>
      df.withColumn(c, when(col("__deleted"), value).otherwise(col(c)))
    }.drop("__deleted")
  }

  /** ON DELETE RESTRICT: how many child rows block the delete (0 = the
    * delete may proceed). */
  def onDeleteRestrictViolations(child: DataFrame, fk: Seq[String],
      deletedKeys: DataFrame): Long =
    child.join(deletedKeys, fkMatch(child, fk, deletedKeys), "left_semi")
      .count()

  /** ON UPDATE CASCADE for a single-column FK: parent key changes (given
    * as an (old -> new) mapping relation) propagate into the child's FK
    * column — one left join + coalesce. The mapping relation is renamed
    * into an internal namespace first (same trap as [[onDeleteSet]]: a
    * mapping whose old-key column shares the FK's name would be merged
    * by withColumn and then dropped with it). */
  def onUpdateCascade(child: DataFrame, fk: String,
      keyMap: DataFrame): DataFrame = {
    requireNoScratch(child)
    val Array(oldK, newK) = keyMap.columns
    val renamed = keyMap.select(
      col(oldK).as("__ra_old"), col(newK).as("__ra_new"))
    child.join(renamed, child(fk) === renamed("__ra_old"), "left")
      .withColumn(fk, coalesce(renamed("__ra_new"), child(fk)))
      .drop("__ra_old", "__ra_new")
  }
}
