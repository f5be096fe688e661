package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the two-phase rank that replaces a
  * single-partition `row_number() OVER (ORDER BY ...)` window.
  *
  * Phase 1 range-partitions the input on the sort order (contiguous key
  * ranges, every row of partition i ordered before every row of partition
  * i+1) and numbers rows locally with a window PARTITIONED by the range
  * partition id. Phase 2 turns the per-partition row counts — at most
  * `numPartitions` rows — into exclusive prefix offsets with a tiny
  * triangle join (no global window anywhere, so the plan carries no
  * SinglePartition exchange at all) and broadcast-joins them back:
  * `global rank = offset(partition) + local row number`.
  *
  * The result is identical to the single-partition window for any TOTAL
  * sort order, regardless of where the sampled range boundaries fall —
  * ranks are boundary-independent — which PropertySpec pins against the
  * naive form on random inputs. The caller must pass a total order (add a
  * unique tie-break column if the primary key can repeat): range
  * partitioning sends equal keys to one partition, but the local row
  * number among ties would then depend on intra-partition order.
  */
object Ranks {

  def rowNumberByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      out: String): DataFrame =
    prefixByRange(df, numPartitions, order,
      localOver = w => row_number().over(w).cast("long"),
      partTotal = count(lit(1)))
      .withColumn(out, (col("__rank_off") + col("__rank_local")).cast("int"))
      .drop("__rank_local", "__rank_off")

  /** Distributed inclusive running sum of `value` in `order` — the prefix
    * scan behind budget cuts and cumulative quotas, same two-phase shape
    * as [[rowNumberByRange]] (and the same total-order precondition). */
  def runningSumByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame =
    prefixByRange(df.withColumn("__rank_v", value), numPartitions, order,
      localOver = w => sum(col("__rank_v")).over(w),
      partTotal = sum(col("__rank_v")))
      .withColumn(out, col("__rank_off") + col("__rank_local"))
      .drop("__rank_local", "__rank_off", "__rank_v")

  /** Shared two-phase core: range partition on the sort order, a local
    * per-partition window (`localOver`, partitioned by the range partition
    * id), and each partition's exclusive prefix offset (`partTotal` rolled
    * up per partition — at most `numPartitions` rows — then prefix-summed
    * with a tiny triangle join and broadcast back). No global window, so
    * no SinglePartition exchange anywhere in the plan. */
  private def prefixByRange(
      df: DataFrame,
      numPartitions: Int,
      order: Seq[Column],
      localOver: org.apache.spark.sql.expressions.WindowSpec => Column,
      partTotal: Column): DataFrame = {
    val parts = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__rank_pid", spark_partition_id())
    val local = parts.withColumn("__rank_local",
      localOver(Window.partitionBy(col("__rank_pid")).orderBy(order: _*)))
    val counts = parts.groupBy(col("__rank_pid"))
      .agg(partTotal.as("__rank_n"))
    val offsets = counts.as("a")
      .join(counts.as("b"),
        col("b.__rank_pid") < col("a.__rank_pid"), "left")
      .groupBy(col("a.__rank_pid").as("__rank_pid2"))
      .agg(coalesce(sum(col("b.__rank_n")), lit(0L)).as("__rank_off"))
    local.join(broadcast(offsets), col("__rank_pid") === col("__rank_pid2"))
      .drop("__rank_pid", "__rank_pid2")
  }
}
