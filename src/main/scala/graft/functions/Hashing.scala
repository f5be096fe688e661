package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** SplitMix64 finalizer over a seeded 64-bit input — the permutation family
  * behind the MinHash signatures and SimHash bit streams (public algorithm:
  * Steele et al., "Fast Splittable Pseudorandom Number Generators",
  * OOPSLA 2014).
  *
  * A native Catalyst expression rather than column arithmetic because the
  * mixing multiplies MUST wrap modulo 2^64: Spark 4 runs ANSI mode by
  * default, where `Column * Column` raises ARITHMETIC_OVERFLOW. Java long
  * arithmetic in generated code wraps silently, which is the semantics a
  * hash mixer needs — and keeps the whole pipeline inside whole-stage
  * codegen (no UDF boundary).
  */
case class Mix64(child: Expression, seed: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  // BIGINT only: the generated `$c ^ seedL` would silently widen an INT
  // child while the interpreted path ClassCastExceptions — the same
  // query succeeding or crashing depending on codegen is worse than a
  // loud analysis error
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mix64 requires a BIGINT input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Mix64.mix(input.asInstanceOf[Long] ^ seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.mix($c ^ ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)

  override def prettyName: String = "graft_mix64"
}

object Mix64 {

  /** The SplitMix64 finalizer; bijective on 64 bits. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column form: mix64(c ^ seed). Distinct seeds give independent hash
    * functions from one base hash (standard seeded-mixer construction). */
  def mix64(c: Column, seed: Long = 0L): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(Mix64(ColumnBridge.expression(c), seed))
  }
}
