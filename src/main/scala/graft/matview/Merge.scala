package graft.matview

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  *    Keys match NULL-SAFELY (`<=>`, the semantics of grouping keys —
  *    a NULL-keyed group's state is one group and must supersede), and
  *    duplicate source keys raise at runtime: two "full new states" for
  *    one group is a cardinality violation, and silently inserting both
  *    would corrupt the MV.
  *  - [[outer]]: matched rows are combined column-wise (full-outer join +
  *    caller-built projection), with a delete predicate applied after
  *    resolution. The predicate is deliberately GENERAL: it is evaluated
  *    on every RESOLVED row (the projection's namespace — the t/u
  *    aliases are gone, so a predicate over an unprojected source column
  *    fails
  *    loudly at analysis, never silently), which expresses both SQL
  *    MERGE delete arms when the caller scopes it by the row's
  *    matched-ness — carried through the projection as the nullness of
  *    either side's key or an action marker, exactly as `merge_upsert`'s
  *    `merge_action === "unchanged"` scopes its delete to
  *    WHEN NOT MATCHED BY SOURCE (the lakehouse extension arm). An
  *    unscoped predicate applies to inserts too — scope it unless that
  *    is what you mean. A target row matched by MORE THAN ONE source
  *    row raises at runtime (the ANSI "MERGE matched more than one row"
  *    cardinality violation) instead of silently double-counting the
  *    target payload — and ONLY then: duplicate source rows whose key
  *    matches no target row legally both INSERT (ANSI MERGE and the
  *    lakehouse implementations agree), and NULL-keyed source rows can
  *    never match under the `===` join, so neither trips the guard.
  *
  * Both are pure keyed relational plans: one shuffle on the merge key at
  * any scale, broadcastable when one side is small (AQE decides from
  * runtime sizes). The cardinality guards add one window count over the
  * SOURCE keyed the same way as the merge itself — partial aggregation
  * makes it a cheap pre-pass of the side that is small by contract (a
  * delta / a micro-batch), never a second pass over the target.
  */
object Merge {

  /** Fail the job when a key group in `df` holds more than one row —
    * evaluated row-wise inside a filter so it costs one keyed window
    * count and cannot be pruned away. */
  private def requireUniqueKeys(df: DataFrame, keys: Seq[Column],
      what: String): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(keys: _*))
    // the window count rides a projected column (a window expression is
    // not legal directly inside a Filter), then the guard filter — which
    // references it, so it cannot be pruned — evaluates row-wise
    df.withColumn("__merge_n", n)
      .filter(when(col("__merge_n") > 1, raise_error(lit(
        s"MERGE cardinality violation: $what"))).otherwise(lit(true)))
      .drop("__merge_n")
  }

  /** MERGE where source rows replace matched target rows and unmatched
    * source rows are inserted; unmatched target rows are kept. */
  def replace(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val src = requireUniqueKeys(source, keys.map(col),
      "duplicate source keys in replace() — one group must carry ONE " +
        "full new state")
    val u = src.select(keys.map(col): _*)
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    target.as("t").join(u.as("u"), cond, "left_anti").unionByName(src)
  }

  /** General MERGE: full-outer join of `target` (alias `t`) and `source`
    * (alias `u`) on `keyCol`; `projection` builds the resolved columns
    * from the `t.*` / `u.*` namespaces; rows where `deleteWhen` holds
    * (evaluated over the PROJECTED row) are dropped afterwards — scope
    * it by matched-ness carried through the projection for the standard
    * MERGE delete arms (see the object doc). */
  def outer(target: DataFrame, source: DataFrame, keyCol: String)(
      projection: Seq[Column], deleteWhen: Column = lit(false)): DataFrame = {
    // Per-key source multiplicity rides the join on the u side, so the
    // guard can fire ONLY on matched rows (both keys non-null after the
    // === join): duplicate UNMATCHED source keys both insert, and
    // NULL-keyed source rows never match — neither is a violation under
    // ANSI MERGE. The window reuses the join's own key partitioning.
    // The helper column is internal: a source that already carries one
    // would be silently clobbered by withColumn, so refuse loudly; and it
    // is dropped BEFORE the caller's projection runs, so the documented
    // t.*/u.* namespace never contains it (qualified resolution survives
    // the drop's Project — attribute qualifiers persist).
    val guard = "__merge_src_n"
    require(!source.columns.contains(guard) && !target.columns.contains(guard),
      s"Merge.outer: '$guard' is reserved for the cardinality guard")
    val srcN = source.withColumn(guard,
      count(lit(1)).over(Window.partitionBy(col(keyCol))))
    target.as("t")
      .join(srcN.as("u"), col(s"t.$keyCol") === col(s"u.$keyCol"),
        "full_outer")
      .filter(when(
        col(s"t.$keyCol").isNotNull && col(s"u.$keyCol").isNotNull &&
          col(guard) > 1,
        raise_error(lit("MERGE cardinality violation: target row matched " +
          s"more than one source row on $keyCol"))).otherwise(lit(true)))
      .drop(guard)
      .select(projection: _*)
      // SQL MERGE deletes only when the condition is TRUE; a NULL predicate
      // (e.g. one referencing the absent side of an unmatched row) KEEPS
      // the row — filter(!NULL) would silently drop it
      .filter(!coalesce(deleteWhen, lit(false)))
  }
}
