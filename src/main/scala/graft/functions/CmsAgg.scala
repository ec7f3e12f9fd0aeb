package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min Sketch aggregate over a 28-bit-hashed item column — the
  * mergeable frequency sketch next to the engine's HLL (q34) and KLL
  * (q37): D=4 hash rows × W=256 counters, row j's bucket for item hash h
  * is ((h·A_j + B_j) mod P) mod W, with A/B/P shared with [[MinHashAgg]]
  * (one source of truth; the same arithmetic is reproducible in any SQL
  * engine, which is what makes the sketch itself oracle-checkable —
  * not just its accuracy bounds).
  *
  * The buffer is the whole 4×256 counter grid (8 KB of state per group);
  * update is 4 integer multiplies + adds per row, merge is elementwise
  * sum — the shape that makes CMS the standard distributed/streaming
  * heavy-hitter primitive: partial sketches combine associatively, so
  * map-side combine and micro-batch state both work unchanged at 100 TB.
  */
case class CmsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CmsAgg.D * CmsAgg.W)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < CmsAgg.D) {
        val bucket = (((h * MinHashAgg.A(j) + MinHashAgg.B(j)) % MinHashAgg.P) % CmsAgg.W).toInt
        buffer(j * CmsAgg.W + bucket) += 1L
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(CmsAgg.D * CmsAgg.W)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // update() casts the evaluated input straight to Long — without this
  // check a SQL caller passing an INT/DOUBLE column would get a runtime
  // ClassCastException mid-job instead of an analysis error (ADVICE r12)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_agg expects a BIGINT item-hash column, got ${t.catalogString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

object CmsAgg {
  val D = 4
  val W = 256

  /** `cms_agg(hashCol)` → array<long> of D·W counters (row-major). */
  def cms_agg(h: Column): Column =
    GraftShims.columnOf(CmsAgg(GraftShims.expressionOf(h)).toAggregateExpression())
}
