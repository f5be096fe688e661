package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashes of a document in ONE codegen'd pass over the
  * UTF-8 bytes: split on single spaces (the exact token boundaries of
  * `split(text, ' ')`, empty tokens included), xxhash64 each word in place
  * (no per-word UTF8String allocation), then hash each length-n window of
  * word hashes with the same seed-chaining Spark's multi-argument
  * `xxhash64(hw_i, …, hw_{i+n-1})` uses — bit-equal to the composed
  * column form, pinned by WordGramHashesSpec.
  *
  * Exists because the composed form needs two higher-order `transform`
  * lambdas, and Spark's higher-order functions are CodegenFallback: one in
  * a projection drops the whole row out of whole-stage codegen and
  * allocates a gram string per window. Fewer than n words → empty array
  * (the `size(ws) >= 3` guard, folded in).
  *
  * Shingle identity is unchanged from hashing the gram STRING: words never
  * contain the separator, so the (w_i…w_{i+n-1}) tuple and the joined gram
  * string are in bijection; every consumer (Jaccard counts, MinHash
  * signatures) only needs a consistent injective-modulo-collisions hash.
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram size must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes needs a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashes.gramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordGramHashes.gramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)

  override def prettyName: String = "graft_word_gram_hashes"
}

object WordGramHashes {

  /** Spark's default hash seed (XxHash64 expression). */
  final val SEED = 42L

  /** One pass: word hashes into a scratch buffer, then the n-window
    * seed-chain. Byte 0x20 never occurs inside a UTF-8 multi-byte
    * sequence, so single-byte scanning finds exactly the boundaries
    * `split(text, ' ')` finds. */
  def gramHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var hw = new Array[Long](math.max(8, len / 4))
    var nw = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        if (nw == hw.length) hw = java.util.Arrays.copyOf(hw, nw * 2)
        hw(nw) = XXH64.hashUnsafeBytes(base, off + start, i - start, SEED)
        nw += 1
        start = i + 1
      }
      i += 1
    }
    if (nw < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nw - n + 1)
    var j = 0
    while (j < out.length) {
      var h = SEED
      var k = 0
      while (k < n) { h = XXH64.hashLong(hw(j + k), h); k += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  def word_gram_hashes(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(WordGramHashes(ColumnBridge.expression(c), n))
  }
}
