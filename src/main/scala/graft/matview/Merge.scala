package graft.matview

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The MERGE INTO primitive, shared by the batch upsert key
  * (`merge_upsert`, Lifecycle) and the streaming MV refresh sink
  * (`matview_stream_refresh` / `events_stream_late_drop`, StreamingOps) —
  * one routine, two resolutions:
  *
  *  - [[replace]]: a matched target row is superseded by its source row
  *    wholesale (the idempotent-upsert contract of an update-mode
  *    streaming sink, where each upsert carries the group's full new
  *    state). Planned as anti-join + union: matched target payloads are
  *    never read, and the join ships only the source's key columns.
  *  - [[outer]]: matched rows are combined column-wise (full-outer join +
  *    caller-built projection), with a WHEN-MATCHED-THEN-DELETE predicate
  *    applied after resolution — SQL MERGE's general form.
  *
  * Both are pure keyed relational plans: one shuffle on the merge key at
  * any scale, broadcastable when one side is small (AQE decides from
  * runtime sizes).
  */
object Merge {

  /** MERGE where source rows replace matched target rows and unmatched
    * source rows are inserted; unmatched target rows are kept. */
  def replace(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame =
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source)

  /** General MERGE: full-outer join of `target` (alias `t`) and `source`
    * (alias `u`) on `keyCol`; `projection` builds the resolved columns
    * from the `t.*` / `u.*` namespaces; rows where `deleteWhen` holds are
    * dropped afterwards (WHEN MATCHED AND cond THEN DELETE). */
  def outer(target: DataFrame, source: DataFrame, keyCol: String)(
      projection: Seq[Column], deleteWhen: Column = lit(false)): DataFrame =
    target.as("t")
      .join(source.as("u"), col(s"t.$keyCol") === col(s"u.$keyCol"),
        "full_outer")
      .select(projection: _*)
      // SQL MERGE deletes only when the condition is TRUE; a NULL predicate
      // (e.g. one referencing the absent side of an unmatched row) KEEPS
      // the row — filter(!NULL) would silently drop it
      .filter(!coalesce(deleteWhen, lit(false)))
}
