package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded exact top-k aggregate over (score, id) pairs: keeps the k best
  * rows per group — score descending, id ascending on ties — in O(k) state,
  * returning `array<struct<neighbor_id, rank, score>>` best-first.
  *
  * This is the aggregate form of `row_number() OVER (PARTITION BY g ORDER
  * BY score DESC, id) <= k`: the window form shuffles and FULLY SORTS every
  * scored row (all n·|Q| candidate scores at 100 TB) just to discard all
  * but k per group, while this aggregate folds each partition's rows into
  * a k-slot buffer map-side and shuffles only the k-row partial per group —
  * the same partial/final contract as any sum. Result equality with the
  * window form is pinned in TopKAggSpec.
  *
  * The buffer is a best-first insertion-sorted pair of primitive arrays
  * (k is single digits for ANN reranks — binary heaps would only add
  * constant overhead); merge is a k-bounded merge of two sorted buffers.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, "top-k needs k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_k requires (DOUBLE score, BIGINT id), got " +
        s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): TopKAgg.Buf =
    new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    // NULL and NaN scores are SKIPPED (deterministic contract): NaN
    // compares false in both directions, so letting it into the buffer
    // would wedge or drop it depending on partition arrival order. The
    // window form ranks NaN first under DESC — callers that can produce
    // NaN (zero-norm vectors) must filter or expect this divergence.
    if (sv != null && iv != null && !sv.asInstanceOf[Double].isNaN)
      buf.insert(sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](buf.ids(i), i + 1, buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), n)
    var i = 0
    while (i < n) { buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("rank", IntegerType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_top_k"
}

object TopKAgg {

  /** Best-first sorted fixed-capacity buffer. `scores`/`ids` hold the
    * current top `n` (n <= k) with the best pair at index 0. */
  final class Buf(val scores: Array[Double], val ids: Array[Long], var n: Int) {
    private def better(s: Double, i: Long, pos: Int): Boolean =
      s > scores(pos) || (s == scores(pos) && i < ids(pos))

    def insert(s: Double, i: Long): Unit = {
      val k = scores.length
      if (n == k && !better(s, i, k - 1)) return
      // find insertion position (linear: k is single digits)
      var p = if (n == k) k - 1 else n
      while (p > 0 && better(s, i, p - 1)) p -= 1
      // shift worse entries down, dropping the overflow
      var q = math.min(n, k - 1)
      while (q > p) { scores(q) = scores(q - 1); ids(q) = ids(q - 1); q -= 1 }
      scores(p) = s; ids(p) = i
      if (n < k) n += 1
    }
  }

  def top_k(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
  }
}
