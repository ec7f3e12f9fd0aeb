package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact 128-bit integer SUM of a BIGINT column — the HUGEINT-sum
  * primitive DuckDB aggregates with natively, as a two-long carry-adder
  * (10th SQL-registered custom function, `sum128_agg`).
  *
  * Why not `SUM(CAST(x AS DECIMAL(38,0)))`: Spark's Decimal aggregation
  * boxes every row into a JavaBigDecimal-backed `Decimal` and runs an
  * unvectorized add per row — measured 3.7× slower than DuckDB's
  * int128 path on the q56 shape at sf10. This aggregate keeps the group
  * state as two plain longs (hi, lo — two's-complement 128-bit) and the
  * per-row work at one 64-bit add plus a bitwise carry-out:
  *   carry = MSB of ((lo & v) | ((lo | v) & ~(lo + v)))
  * with the addend sign-extended into the high word (v >> 63). Merge is
  * the same adder over two 128-bit states, so partial aggregation and
  * AQE work unchanged; eval converts the final (hi, lo) pair to exact
  * decimal digits ONCE per group via BigInteger (group-count-sized work,
  * never per-row).
  *
  * Why 128-bit matters at all: the factored rewrite
  * `SUM(cents) * 10^8` stays in int64 at gate scale but overflows at
  * 10^12 rows × 10^7 cents — the sum itself must be wider than 64 bits
  * for the money-math contract to survive 100 TB (q56's scaladoc).
  * Digits are emitted as a string because the pandas/DuckDB bridge
  * narrows >int64 decimals to float64.
  */
case class Sum128Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // buffer(0) = hi, buffer(1) = lo (two's-complement 128-bit value),
  // buffer(2) = nonzero iff at least one non-NULL input was accumulated
  // (SQL SUM semantics: empty / all-NULL group sums to NULL, not 0).
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val lo = buffer(1)
      val nlo = lo + x
      val carry = ((lo & x) | ((lo | x) & ~nlo)) >>> 63
      buffer(1) = nlo
      buffer(0) = buffer(0) + (x >> 63) + carry
      buffer(2) = 1L
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val lo = b1(1); val x = b2(1)
    val nlo = lo + x
    val carry = ((lo & x) | ((lo | x) & ~nlo)) >>> 63
    b1(1) = nlo
    b1(0) = b1(0) + b2(0) + carry
    b1(2) = b1(2) | b2(2)
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer(2) == 0L) null
    else UTF8String.fromString(Sum128Agg.toBigInteger(buffer(0), buffer(1)).toString)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putLong(buffer(0)); bb.putLong(buffer(1)); bb.putLong(buffer(2))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong, bb.getLong)
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sum128_agg expects a BIGINT column, got ${t.catalogString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): Sum128Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Sum128Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Sum128Agg =
    copy(child = newChild)
}

object Sum128Agg {
  /** (hi, lo) two's-complement 128-bit → BigInteger (eval-time only). */
  def toBigInteger(hi: Long, lo: Long): java.math.BigInteger = {
    val loU = java.math.BigInteger.valueOf(lo & Long.MaxValue)
      .add(if (lo < 0) java.math.BigInteger.ONE.shiftLeft(63)
           else java.math.BigInteger.ZERO)
    java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loU)
  }

  /** `sum128_agg(longCol)` → exact decimal-digit string of the 128-bit sum. */
  def sum128_agg(c: Column): Column =
    GraftShims.columnOf(Sum128Agg(GraftShims.expressionOf(c)).toAggregateExpression())
}
