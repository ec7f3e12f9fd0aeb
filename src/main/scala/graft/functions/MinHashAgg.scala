package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass MinHash signature aggregate: for each of the K fixed hash
  * functions h_j(x) = (a_j·x + b_j) mod p, keeps the minimum over all
  * input hashes in a single mutable buffer — a custom Catalyst
  * `TypedImperativeAggregate` (SURVEY.md §4.2 custom-aggregate tier).
  *
  * Replaces K separate `min()` aggregates with one buffer update per row:
  * at 100 TB the signature computation is one shuffle with K longs of
  * state per group instead of K aggregate columns. Map-side partial
  * aggregation and merge() work like any built-in aggregate.
  *
  * Coefficients match graft.queries.TextDedup (and its DuckDB oracle):
  * inputs are 28-bit md5-derived hashes, so a_j·x stays below 2^48.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashAgg.K)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < MinHashAgg.K) {
        val m = (h * MinHashAgg.A(j) + MinHashAgg.B(j)) % MinHashAgg.P
        if (m < buffer(j)) buffer(j) = m
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < MinHashAgg.K) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(MinHashAgg.K * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(MinHashAgg.K)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  val K = 8
  val A: Array[Long] = Array(999983L, 999979L, 999961L, 999959L, 999953L, 999931L, 999917L, 999907L)
  val B: Array[Long] = Array(17L, 31L, 47L, 61L, 79L, 97L, 113L, 131L)
  val P = 1000000007L

  /** `minhash_agg(hashCol)` → array<long> signature of length K. */
  def minhash_agg(h: Column): Column =
    GraftShims.columnOf(MinHashAgg(GraftShims.expressionOf(h)).toAggregateExpression())
}
