package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSession

/** Native as-of join — the full custom-operator stack (logical node,
  * planner strategy, physical exec), for the case where the composed
  * union+window form ([[graft.operators.AsOfJoin]]) leaves performance on
  * the table: the composition materializes the union and sorts left+right
  * rows *together* through one window; this exec co-partitions the two
  * sides on the key, sorts each side independently (EnsureRequirements
  * inserts the exchanges/sorts), and streams a per-partition merge that
  * keeps exactly one candidate right row of state.
  *
  * Semantics (LEFT OUTER, backward): for each left row, the latest right
  * row with the same key and rightTime <= leftTime; right columns null when
  * none. Identical to the composed form (pinned by AsOfJoinNativeSpec) and
  * to DuckDB's `ASOF LEFT JOIN`.
  *
  * v1 scope: key and time expressions must evaluate to long-backed types
  * (int/long/timestamp) — covers the engine's event surface; comparisons
  * run on primitive longs inside the merge loop.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  // the key is emitted once (left copy) — right key would be ambiguous
  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(_.exprId == rightKey.asInstanceOf[Attribute].exprId)
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output
      .filterNot(_.exprId == rightKey.asInstanceOf[Attribute].exprId)
      .map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.size
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // JoinedRow covers the FULL left++right schema; project to the
      // deduplicated output (right key dropped). The input-side right
      // attributes are marked nullable: UnsafeProjection binds null
      // CHECKS from the INPUT schema's nullability, and the unmatched
      // path feeds a null-filled right row — binding against the
      // original (possibly non-nullable) right.output would read the
      // null slots as 0/garbage instead of NULL.
      val proj = UnsafeProjection.create(schema,
        left.output ++ right.output.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)

      // buffered right cursor; a right row with NULL key or time can
      // never be an as-of match (SQL comparison semantics) — skipped
      // here, which also keeps the merge loop NPE-free (the ascending
      // sort delivers null-keyed rows first)
      var rRow: InternalRow = null
      var rK = 0L
      var rT = 0L
      @scala.annotation.tailrec
      def advanceRight(): Boolean =
        if (rIter.hasNext) {
          rRow = rIter.next()
          val k0 = rKey.eval(rRow)
          val t0 = rTime.eval(rRow)
          if (k0 == null || t0 == null) advanceRight()
          else {
            rK = k0.asInstanceOf[Number].longValue()
            rT = t0.asInstanceOf[Number].longValue()
            true
          }
        } else { rRow = null; false }
      advanceRight()

      // latest matching right row for the current left key
      var matchK = 0L
      var hasMatch = false
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val k0 = lKey.eval(lRow)
        val t0 = lTime.eval(lRow)
        if (k0 == null || t0 == null) {
          // a NULL key or time matches nothing: left row passes through
          // with a null right side, like any unmatched left row
          proj(joined(lRow, nullRight))
        } else {
          val k = k0.asInstanceOf[Number].longValue()
          val t = t0.asInstanceOf[Number].longValue()
          if (hasMatch && matchK != k) hasMatch = false
          // consume right rows up to (k, t]
          while (rRow != null &&
            (rK < k || (rK == k && rT <= t))) {
            if (rK == k) {
              matchRow = rRow.copy()
              matchK = k
              hasMatch = true
            }
            advanceRight()
          }
          val out =
            if (hasMatch && matchK == k) joined(lRow, matchRow)
            else joined(lRow, nullRight)
          proj(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  private val longBacked = Set("integer", "bigint", "timestamp", "date", "smallint")

  /** Install the planner strategy (idempotent) and build the join. Column
    * names must be disjoint across sides except the key. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    // a custom node bypasses the analyzer's relation dedup; when both
    // sides derive from one base relation they share exprIds — re-alias
    // the right side to mint fresh ones
    val rPlan = right
      .select(right.columns.toIndexedSeq.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val (lk, rk) = (attr(lPlan, key), attr(rPlan, key))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    Seq(lk, rk, lt, rt).foreach { a =>
      require(longBacked.contains(a.dataType.simpleString),
        s"as-of native v1 needs long-backed key/time, got ${a.dataType} for ${a.name}")
    }
    // the merge loop compares the two sides' raw long encodings — a
    // TIMESTAMP (micros) against a DATE (days) would pass the per-column
    // guard above and silently mis-match every row; the UNITS must agree
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share one type (one unit): left " +
        s"${lt.dataType.sql}, right ${rt.dataType.sql}")
    require(lk.dataType == rk.dataType,
      s"as-of key columns must share one type: left ${lk.dataType.sql}, " +
        s"right ${rk.dataType.sql}")
    org.apache.spark.sql.graftshim.DatasetBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }
}
