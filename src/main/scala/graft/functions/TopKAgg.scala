package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs: keeps the k best rows
  * by (score DESC, id ASC) in a fixed-size insertion buffer — a custom
  * `TypedImperativeAggregate` (SURVEY.md §4.2 custom-aggregate tier).
  *
  * Replaces the window-function top-k (`row_number() OVER (ORDER BY score
  * DESC)` then `rank <= k`), whose physical plan sorts EVERY scored row
  * inside each partition of the exchange. Here map-side partial
  * aggregation reduces each upstream partition to at most k (score, id)
  * pairs per group before the shuffle, so the exchange carries O(groups·k)
  * rows instead of the full scored set, and nothing is ever globally
  * sorted. At 100 TB the difference is the whole candidate set crossing
  * the wire vs kilobytes per group — the aggregate IS the brute-force
  * ANN reducer (sim01's 6.4M scored rows at sf10 become 10·k).
  *
  * Output: array<struct<id: bigint, score: double>> of length <= k,
  * ordered best-first with ties broken by ascending id — bit-identical to
  * the window formulation's (score DESC, id ASC) frame.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with BinaryLike[Expression] {
  require(k > 0 && k <= (1 << 20), s"top-k size must be in [1, 2^20], got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def createAggregationBuffer(): TopKAgg.Buf =
    new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)

  override def update(buffer: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    var j = 0
    while (j < b2.n) { b1.insert(b2.scores(j), b2.ids(j)); j += 1 }
    b1
  }

  override def eval(buffer: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buffer.n)
    var j = 0
    while (j < buffer.n) {
      rows(j) = InternalRow(buffer.ids(j), buffer.scores(j))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var j = 0
    while (j < buffer.n) { bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(new Array[Double](k), new Array[Long](k), 0)
    var j = 0
    while (j < n) {
      val s = bb.getDouble; val i = bb.getLong
      buf.insert(s, i)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

object TopKAgg {
  /** Sorted insertion buffer of at most k (score, id) pairs, best-first
    * by (score DESC, id ASC). Insertion is O(k) array shift — for the
    * small k of a top-k query this beats heap constant factors and keeps
    * the buffer always ordered, so eval() is a straight copy. */
  final class Buf(val scores: Array[Double], val ids: Array[Long], var n: Int) {
    private def beats(s: Double, i: Long, j: Int): Boolean =
      s > scores(j) || (s == scores(j) && i < ids(j))

    def insert(s: Double, i: Long): Unit = {
      val k = scores.length
      if (n == k && !beats(s, i, n - 1)) return
      // find insertion point (buffer is ordered best-first)
      var pos = if (n == k) n - 1 else n
      while (pos > 0 && beats(s, i, pos - 1)) pos -= 1
      // shift tail right, dropping the last element if full
      val last = if (n == k) k - 1 else n
      var j = last
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = s; ids(pos) = i
      if (n < k) n += 1
    }
  }

  /** `topk_agg(score, id, k)` → array<struct<id, score>> of the k best
    * rows by (score DESC, id ASC). */
  def topk_agg(score: Column, id: Column, k: Int): Column =
    GraftShims.columnOf(TopKAgg(GraftShims.expressionOf(score),
      GraftShims.expressionOf(id), k).toAggregateExpression())
}
