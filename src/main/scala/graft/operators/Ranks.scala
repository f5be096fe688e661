package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed global row numbering / prefix scan — the two-phase shape
  * that replaces a single-partition `OVER (ORDER BY ...)` window.
  *
  * Phase 1 range-partitions the input on the sort order (contiguous key
  * ranges: every row of partition i orders before every row of partition
  * i+1), sorts within partitions, and runs ONE narrow per-partition scan
  * that emits each row's local running total and its partition id — no
  * window, so Spark inserts no second exchange (a `Window.partitionBy(pid)`
  * here would re-shuffle the whole relation to hashpartitioning(pid) on
  * top of the range exchange). The scanned result is localCheckpointed:
  * the range sampler draws boundaries with a per-instantiation seed, so
  * the per-partition counts MUST be read from the same materialized pass
  * that numbered the rows — deriving them from a second instantiation of
  * the plan would only be correct while exchange reuse happens to unify
  * the subtrees. Phase 2 turns the per-partition totals — at most
  * `numPartitions` rows — into exclusive prefix offsets with a tiny
  * triangle join and broadcast-joins them back:
  * `global value = offset(partition) + local running value`.
  *
  * The single wide data movement is the range exchange; everything after
  * it is narrow or numPartitions-sized. The result is identical to the
  * single-partition window for any TOTAL sort order, regardless of where
  * the sampled range boundaries fall — which RanksSpec pins against the
  * naive form on random inputs (and RanksSpec/PlanSpec pin the plan shape:
  * the staging plan's only exchange is the range exchange). The caller
  * must pass a total order (add a unique tie-break column if the primary
  * key can repeat): range partitioning sends equal keys to one partition,
  * but the local scan among ties would then depend on intra-partition
  * order. NULL running-sum values count as 0 (SQL `sum() OVER` instead
  * carries nulls through an all-null prefix); both current callers feed
  * non-null longs.
  */
object Ranks {

  /** Refuse an input already carrying one of the scratch names: the
    * pipeline's withColumn would silently CLOBBER the caller's column
    * and the final drop would delete it (the Merge.outer guard-column
    * precedent — loud beats silent data loss). */
  private def requireScratchFree(df: DataFrame): Unit = {
    val clash = df.columns.find(_.startsWith("__rank_"))
    require(clash.isEmpty,
      s"Ranks: column '${clash.get}' collides with the operator's " +
        "reserved __rank_* scratch namespace")
  }

  private val PID = "__rank_pid"
  private val RN = "__rank_rn"
  private val RUN = "__rank_run"
  private val V = "__rank_v"
  private val OFF = "__rank_off"
  private val PID2 = "__rank_pid2"
  private val RUNX = "__rank_runx"
  private val RUNI = "__rank_runi"

  /** Output rank is INT (the engine's key/oracle surface): past 2^31-1
    * rows the cast raises CAST_OVERFLOW under the engine's default ANSI
    * mode — a loud stop, never a silent wrap. A deployment numbering
    * beyond that keeps the long (drop the cast per call site). */
  def rowNumberByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      out: String): DataFrame =
    prefixByRange(df, numPartitions, order, lit(1L))
      .withColumn(out, (col(OFF) + col(RUN)).cast("int"))
      .drop(RN, RUN, OFF)

  /** Distributed inclusive running sum of `value` (a non-null long) in
    * `order` — the prefix scan behind budget cuts and cumulative quotas,
    * same two-phase shape as [[rowNumberByRange]] (and the same
    * total-order precondition). */
  def runningSumByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame =
    prefixByRange(df, numPartitions, order, value.cast("long"))
      .withColumn(out, col(OFF) + col(RUN))
      .drop(RN, RUN, OFF)

  /** Distributed EXCLUSIVE prefix max of `value` (a non-null long) in
    * `order`: each row gets the max over all rows strictly before it in
    * the total order, NULL for the globally first row. The dominance
    * primitive behind skyline/Pareto queries — "best value among
    * everything cheaper than me" — with the same two-phase shape (and
    * total-order precondition) as [[rowNumberByRange]]: one range
    * exchange, a narrow per-partition scan emitting the running max
    * BEFORE each row, then per-partition totals folded to prefix offsets
    * through the numPartitions-sized triangle join and broadcast back.
    * Unlike the sum scans, max has no inverse, so the exclusive value is
    * emitted directly by the scan rather than derived from an inclusive
    * one. */
  def prefixMaxByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    requireScratchFree(df)
    val scanned =
      scanStagingMax(df, numPartitions, order, value.cast("long"))
        .localCheckpoint()
    // partition total = inclusive running max at the last row = max of
    // the per-row inclusive column
    val counts = scanned.groupBy(col(PID))
      .agg(max(col(RUNI)).as("__rank_m"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID2))
      .agg(max(col("b.__rank_m")).as(OFF)) // null for partition 0
    scanned.join(broadcast(offsets), col(PID) === col(PID2))
      // greatest skips nulls: null OFF (first partition) and null RUNX
      // (first row of a partition) fall back to the other side; both
      // null -> globally first row -> null out
      .withColumn(out, greatest(col(OFF), col(RUNX)))
      .drop(PID, PID2, RN, RUNI, RUNX, OFF)
  }

  /** Phase-1 scan for [[prefixMaxByRange]]: range partition + sort, then
    * one narrow pass emitting each row's EXCLUSIVE (null-first) and
    * inclusive local running max. Exposed for the staging-plan pin. */
  private[graft] def scanStagingMax(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column): DataFrame = {
    val base = df
      .withColumn(V, value)
      .repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = base.schema
      .add(PID, IntegerType, nullable = false)
      .add(RN, LongType, nullable = false)
      .add(RUNX, LongType, nullable = true)
      .add(RUNI, LongType, nullable = false)
    val vIdx = base.schema.fieldIndex(V)
    base.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rn = 0L
      var seen = false
      var acc = 0L
      it.map { r =>
        rn += 1
        val before: Any = if (seen) acc else null
        val v = r.getLong(vIdx) // contract: non-null long
        if (!seen || v > acc) { acc = v; seen = true }
        Row.fromSeq(r.toSeq :+ pid :+ rn :+ before :+ acc)
      }
    }(Encoders.row(schema)).drop(V)
  }

  /** Phase 1 BEFORE materialization — exposed so the specs can pin the
    * staging plan (exactly one exchange, the range one; no Window, no
    * SinglePartition). The public entry points checkpoint this. */
  private[graft] def scanStaging(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column): DataFrame = {
    val base = df
      .withColumn(V, value)
      .repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = base.schema
      .add(PID, IntegerType, nullable = false)
      .add(RN, LongType, nullable = false)
      .add(RUN, LongType, nullable = false)
    val vIdx = base.schema.fieldIndex(V)
    base.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rn = 0L
      var acc = 0L
      it.map { r =>
        rn += 1
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ pid :+ rn :+ acc)
      }
    }(Encoders.row(schema)).drop(V)
  }

  /** Shared two-phase core: the phase-1 scan, pinned by localCheckpoint,
    * then per-partition totals -> exclusive prefix offsets (triangle join
    * over at most `numPartitions` rows) broadcast back. Output carries
    * `RN` (local 1-based row number), `RUN` (global inclusive running
    * value), `OFF` (exclusive partition offset) for the wrappers. */
  private def prefixByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column): DataFrame = {
    requireScratchFree(df)
    val scanned = scanStaging(df, numPartitions, order, value).localCheckpoint()
    val counts = scanned.groupBy(col(PID))
      // the partition's total = its LAST running value (max_by on the
      // local row number, not max: sums of negative values regress)
      .agg(max_by(col(RUN), col(RN)).as("__rank_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID2))
      .agg(coalesce(sum(col("b.__rank_n")), lit(0L)).as(OFF))
    scanned.join(broadcast(offsets), col(PID) === col(PID2))
      .drop(PID, PID2)
  }
}
