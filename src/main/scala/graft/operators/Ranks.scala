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
      out: String): DataFrame = {
    val parts = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__rank_pid", spark_partition_id())
    val local = parts.withColumn("__rank_local",
      row_number().over(
        Window.partitionBy(col("__rank_pid")).orderBy(order: _*)))
    val counts = parts.groupBy(col("__rank_pid"))
      .agg(count(lit(1)).as("__rank_n"))
    // exclusive prefix sum over <= numPartitions rows: a triangle join on
    // the tiny count relation instead of a global ORDER BY window
    val offsets = counts.as("a")
      .join(counts.as("b"),
        col("b.__rank_pid") < col("a.__rank_pid"), "left")
      .groupBy(col("a.__rank_pid").as("__rank_pid2"))
      .agg(coalesce(sum(col("b.__rank_n")), lit(0L)).as("__rank_off"))
    local.join(broadcast(offsets), col("__rank_pid") === col("__rank_pid2"))
      .withColumn(out, (col("__rank_off") + col("__rank_local")).cast("int"))
      .drop("__rank_pid", "__rank_pid2", "__rank_local", "__rank_off")
  }
}
