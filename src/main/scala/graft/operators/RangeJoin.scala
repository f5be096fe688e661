package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: match points to intervals ("which promotions cover
  * this order date", "which maintenance window contains this event") as an
  * EQUI-join on a bin key plus a residual range filter — the standard
  * interval-join decomposition (the same binning trick production engines
  * use for their range-join optimizations).
  *
  * Spark's native answer to `p >= s AND p < e` with no equi-key is a
  * nested-loop join — quadratic when both sides are large. Binning makes
  * it shuffle-shaped: each point lands in exactly one bin of width W; each
  * interval replicates into the ceil(len/W)+1 bins it overlaps; the join
  * key is the bin. Cost is |points| + |intervals| x (len/W + 1) shuffled
  * rows and the residual predicate evaluates only within matching bins.
  * Each (point, interval) pair meets in exactly one bin (the point's), so
  * no post-join dedup is needed. Pick W near the typical interval length:
  * larger W = fewer replicas but fatter bins (more residual filtering);
  * at 100 TB both sides partition by bin and the shuffle is even as long
  * as points spread across bins — a hot bin is a SaltedJoin case.
  */
object RangeJoin {

  /** Inner join of `points` (long column `pointCol`) against `intervals`
    * (long columns `startCol` inclusive, `endCol` exclusive) on
    * containment: start <= point < end. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    // a caller column named __bin would be clobbered by withColumn and
    // deleted by the final drop — refuse loudly (the Merge.outer
    // guard-column precedent)
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "RangeJoin: '__bin' is reserved for the binning machinery")
    // exact integer floor division (x - pmod(x, w)) div w, the same form
    // as the rule-based rewrite (RangeJoinRule.floorDiv): floor(col / w)
    // rounds through an IEEE double, which misbins longs past 2^53 —
    // epoch-micros keys live within an order of magnitude of that edge.
    // Names are backtick-quoted: a reserved-word or dotted/spaced column
    // ("end", "event.ts") must parse as one identifier, not SQL syntax.
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    def binOf(x: String) = {
      val c = q(x)
      expr(s"(($c - pmod($c, $binWidth)) div $binWidth)")
    }
    val endQ = q(endCol)
    val p = points.withColumn("__bin", binOf(pointCol))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(startCol), expr(
        s"((($endQ - 1) - pmod($endQ - 1, $binWidth)) div $binWidth)"))))
    // col() parses dots as struct access — quote here too
    p.join(iv, p("__bin") === iv("__bin") &&
        col(q(pointCol)) >= col(q(startCol)) && col(q(pointCol)) < col(q(endCol)))
      .drop("__bin")
  }
}
