package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float-array embeddings, accumulated in double in
  * element order — a native Catalyst expression because the declarative
  * alternative (`aggregate(zip_with(...))`) runs its lambdas as
  * CodegenFallback, breaking whole-stage codegen exactly in the hot loop
  * of every similarity rerank. The sequential fold order is part of the
  * contract: it is what the DuckDB oracles replay via `list_reduce`, so
  * results stay bit-identical to the lambda formulation it replaces.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // array<float> only: getFloat over any other element width reads
  // garbage bytes under UnsafeArrayData (silent wrong scores) and
  // ClassCastExceptions under generic rows — reject at analysis
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_vector_dot requires two ARRAY<FLOAT> inputs, got " +
          s"${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    VectorDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vector_dot"
}

object VectorDot {

  /** Element-ordered double fold; inputs must be equal-length float
    * arrays — a length mismatch is a caller bug (mixed embedding
    * dimensions) and fails loudly rather than silently truncating the
    * fold to the shorter side. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException("graft_vector_dot: embedding " +
        s"dimensions differ ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def vector_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
