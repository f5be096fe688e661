package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the latest right row whose time
  * is <= the left row's time, per key — the canonical event-alignment
  * operator for training-data pipelines (join telemetry to the most recent
  * label/state).
  *
  * Spark has no ASOF JOIN; the preference order from the build rules is
  * compose > custom Expression > custom SparkPlan, and this composes with
  * the right scale shape: union the two sides, ONE hash shuffle on the key,
  * sort within partition, and carry the latest right payload forward with a
  * running `last(_, ignoreNulls)` window. No range cross-product, no
  * per-key driver loops — at 100 TB this costs the same single exchange as
  * any equi-join on the key.
  *
  * Ties: right rows sort before left rows at equal time (<= semantics).
  * If several right rows share (key, time), pass a deduplicated right side
  * for full determinism.
  */
object AsOfJoin {

  /** Left as-of-backward join. Result: all left columns, then the right
    * payload columns (null when no right row at or before the left time),
    * then `asof_<rightTime>` — the matched right timestamp.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != rightTime).toSeq

    val l = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__is_left"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"))
    // a right row with NULL key or time can never be an as-of match
    // (equi/ASOF semantics); kept, it would land FIRST in the null-key
    // partition / null-time order and silently match left rows. Left
    // nulls need no guard: the null-key partition then holds no right
    // rows, and a null left time orders before every real right time.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__is_left"),
      struct((col(rightTime).as("__rt") +: rightPayload.map(col)): _*).as("__r"))

    val unioned =
      l.withColumn("__r", lit(null).cast(r.schema("__r").dataType))
        .unionByName(
          r.withColumn("__l", lit(null).cast(l.schema("__l").dataType)))

    // right rows (__is_left=0) order before left rows at equal __t: <=
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val outLeft = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val outRight = rightPayload.map(c => col(s"__asof.$c").as(c)) :+
      col("__asof.__rt").as(s"asof_$rightTime")
    joined.select(outLeft ++ outRight: _*)
  }
}
