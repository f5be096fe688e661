package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over UTF-8 bytes modulo the Mersenne prime
  * 2^61-1 — the document-fingerprint kernel (Rabin–Karp / Rabin
  * fingerprinting; public algorithm). A native expression with codegen:
  * the per-byte loop stays inside whole-stage codegen and the modular
  * arithmetic needs 128-bit intermediates (Math.multiplyHigh), which no
  * column-expression composition provides.
  *
  * Deterministic and engine-independent; not SQL-expressible in the oracle
  * (per-character modular loop), so its query key is rows-only checked and
  * the test suite pins known values and collision behavior.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}

object RollingHash {

  /** 2^61 - 1: reduction is two shifts/adds, no division. */
  final val MOD: Long = (1L << 61) - 1
  /** Base > 255 so distinct byte strings map to distinct polynomials
    * (until the modulus folds them). */
  final val BASE: Long = 257L

  private def mulMod(a: Long, b: Long): Long = {
    // 128-bit product reduced mod 2^61-1
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi:lo) = hi*2^64 + lo; 2^64 ≡ 8 (mod 2^61-1)
    val loMod = (lo & MOD) + (lo >>> 61)
    val hiMod = ((hi << 3) & MOD) + (hi >>> 58)
    reduce(loMod + hiMod)
  }

  private def reduce(x: Long): Long = {
    var v = (x & MOD) + (x >>> 61)
    if (v >= MOD) v -= MOD
    v
  }

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, BASE)
      h = reduce(h + (bytes(i) & 0xFF) + 1) // +1: "" vs "\0" differ
      i += 1
    }
    h
  }

  /** Range variant over unsafe memory — same polynomial, no byte-array
    * copy; lets callers hash words in place (SimHashSig). */
  def hash(base: Object, off: Long, len: Int): Long = {
    var h = 0L
    var i = 0
    while (i < len) {
      h = mulMod(h, BASE)
      h = reduce(h +
        (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF) + 1)
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
