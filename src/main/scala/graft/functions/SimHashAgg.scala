package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** One-pass 56-bit SimHash aggregate: per group (document), accumulates the
  * per-bit majority counters of the two 28-bit word hashes directly in a
  * 56-long mutable buffer — a custom Catalyst `TypedImperativeAggregate`
  * (SURVEY.md §4.2 custom-aggregate tier, MinHashAgg's sibling).
  *
  * Replaces the 56-rows-per-word bit explode the relational derivation
  * needs: the aggregate's input is one row per (doc, word) instead of 56,
  * so at sf10 the signature stage's exchange shrinks from ~2.8B exploded
  * rows to ~50M word rows with 56 longs of state per group. Map-side
  * partial aggregation and merge() behave like any built-in aggregate.
  *
  * Bit semantics match the dd04 DuckDB oracle exactly: bit b of the
  * signature is set iff the count of words whose hash has bit b set is
  * >= the count that do not (score >= 0 — ties set the bit); bits 0-27
  * come from h1, bits 28-55 from h2.
  */
case class SimHashAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](SimHashAgg.BITS)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = left.eval(input)
    val v2 = right.eval(input)
    if (v1 != null && v2 != null) {
      val h1 = v1.asInstanceOf[Long]
      val h2 = v2.asInstanceOf[Long]
      var b = 0
      while (b < 28) {
        buffer(b) += (((h1 >>> b) & 1L) * 2L) - 1L
        buffer(b + 28) += (((h2 >>> b) & 1L) * 2L) - 1L
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = 0
    while (b < SimHashAgg.BITS) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < SimHashAgg.BITS) {
      if (buffer(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(SimHashAgg.BITS * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(SimHashAgg.BITS)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // update() casts both evaluated inputs straight to Long — reject other
  // types at analysis time rather than ClassCastException mid-job
  // (ADVICE r12, same contract as cms_agg/band_keys)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_agg expects two BIGINT hash columns, got " +
            s"${l.catalogString}, ${r.catalogString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashAgg =
    copy(left = newLeft, right = newRight)
}

object SimHashAgg {
  val BITS = 56

  /** `simhash_agg(h1, h2)` → 56-bit signature as a single long. */
  def simhash_agg(h1: Column, h2: Column): Column =
    GraftShims.columnOf(
      SimHashAgg(GraftShims.expressionOf(h1), GraftShims.expressionOf(h2))
        .toAggregateExpression())
}
