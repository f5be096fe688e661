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
    * of rows referencing a deleted parent are rewritten to `value`. */
  def onDeleteSet(child: DataFrame, fk: Seq[String],
      deletedKeys: DataFrame, value: Column): DataFrame = {
    val marked = child.join(
      deletedKeys.select(deletedKeys.columns.toIndexedSeq.map(col): _*)
        .withColumn("__deleted", lit(true)),
      fkMatch(child, fk, deletedKeys), "left")
      .drop(deletedKeys.columns.toIndexedSeq: _*)
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
    * column — one left join + coalesce. */
  def onUpdateCascade(child: DataFrame, fk: String,
      keyMap: DataFrame): DataFrame = {
    val Array(oldK, newK) = keyMap.columns
    child.join(keyMap, child(fk) === keyMap(oldK), "left")
      .withColumn(fk, coalesce(keyMap(newK), child(fk)))
      .drop(oldK, newK)
  }
}
