package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The complete 64-bit SimHash signature of a document in ONE codegen'd
  * pass over the UTF-8 bytes: split on single spaces (empty tokens
  * included, exactly `split(text, ' ')`), per token h =
  * mix64(rolling_hash(token)) hashed in place, then the 64 charikar
  * counters v_k += (bit_k(h) ? +1 : -1) and sig bit k = v_k > 0.
  *
  * Replaces explode(split) + 64 `sum` aggregate columns + a doc_id
  * shuffle with a single per-row projection — no explode, no aggregation,
  * no shuffle; every token's ~20-byte UTF8String allocation disappears
  * and the plan parallelizes by input split alone. Bit-equal to the
  * relational form (SimHashSigSpec) and to the DuckDB oracle's
  * HUGEINT replay (summing +-1 per token INSTANCE equals the oracle's
  * tf-weighted sum over distinct tokens).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.signature($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_sig"
}

object SimHashSig {

  /** One pass: tokens between single-space separators (0x20 never occurs
    * inside a UTF-8 multi-byte sequence), per-token Rabin+mix hash, 64
    * counters, strictly-positive bit rule. */
  def signature(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val v = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        val h = Mix64.mix(RollingHash.hash(base, off + start, i - start))
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) v(k) += 1 else v(k) -= 1
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (v(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  def simhash_sig(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))
  }
}
