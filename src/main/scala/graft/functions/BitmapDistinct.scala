package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact COUNT(DISTINCT) over an integral column as a one-pass paged-bitmap
  * aggregate — the scale path for q23-shaped exact distinct counts.
  *
  * Spark's built-in multi-column distinct aggregation rewrites to an
  * `Expand` (one duplicated input row per distinct column) feeding a hash
  * aggregate keyed on (group, value): at sf10 that is a 120M-row expand and
  * a shuffle whose width is the per-partition distinct-value count — the
  * single most expensive line in the round-2 bench (31% of the sf10 total,
  * 6.3× DuckDB). This aggregate keeps one bitmap per (group, partition)
  * instead: update sets a bit, merge ORs pages, eval popcounts. The shuffle
  * then carries kilobytes of bitmap pages per group rather than tens of
  * millions of (group, value) rows, and there is no Expand — two distinct
  * columns are two independent buffers in the SAME single-pass aggregate.
  *
  * State is paged (4096-bit pages in a hash map keyed by page base), so
  * memory is proportional to the set's *spread*, not the key-space bound:
  * dense surrogate-key domains (TPC-H `l_suppkey`/`l_partkey`, any
  * dictionary-encoded id) cost ~1 bit per possible key in touched pages;
  * pathologically sparse 64-bit domains degenerate to ~520 bytes per key,
  * where the honest answer at 100 TB is the HLL sketch tier (q34) instead.
  * Serialization writes only non-empty words (presence mask per page).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Array[Long]]]
  with UnaryLike[Expression] {

  import BitmapDistinct._

  override def prettyName: String = "bitmap_distinct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // DateType rides along: int32 days internally, a dense domain
      case ByteType | ShortType | IntegerType | LongType | DateType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_distinct expects an integral or date column, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Array[Long]] =
    scala.collection.mutable.LongMap.empty[Array[Long]]

  override def update(buffer: scala.collection.mutable.LongMap[Array[Long]],
                      input: InternalRow): scala.collection.mutable.LongMap[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
      }
      val base = k >> PageShift // arithmetic shift: negatives get their own pages
      val page = buffer.getOrElseUpdate(base, new Array[Long](WordsPerPage))
      val off = (k & PageMask).toInt
      page(off >>> 6) |= (1L << (off & 63))
    }
    buffer
  }

  override def merge(b1: scala.collection.mutable.LongMap[Array[Long]],
                     b2: scala.collection.mutable.LongMap[Array[Long]])
      : scala.collection.mutable.LongMap[Array[Long]] = {
    b2.foreachEntry { (base, page2) =>
      b1.get(base) match {
        case Some(page1) =>
          var w = 0
          while (w < WordsPerPage) { page1(w) |= page2(w); w += 1 }
        // copy rather than adopt: Spark deserializes b2 fresh per merge
        // today, but adopting page2 would alias the arrays and a future
        // caller reusing b2 would see later in-place ORs corrupt it
        case None => b1.update(base, page2.clone())
      }
    }
    b1
  }

  override def eval(buffer: scala.collection.mutable.LongMap[Array[Long]]): Any = {
    var n = 0L
    buffer.foreachValue { page =>
      var w = 0
      while (w < WordsPerPage) { n += java.lang.Long.bitCount(page(w)); w += 1 }
    }
    n
  }

  override def serialize(buffer: scala.collection.mutable.LongMap[Array[Long]]): Array[Byte] = {
    // per page: base(8) + presence mask(8) + only the non-zero words
    var bytes = 4
    buffer.foreachValue { page =>
      bytes += 16
      var w = 0
      while (w < WordsPerPage) { if (page(w) != 0L) bytes += 8; w += 1 }
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    buffer.foreachEntry { (base, page) =>
      bb.putLong(base)
      var mask = 0L
      var w = 0
      while (w < WordsPerPage) { if (page(w) != 0L) mask |= (1L << w); w += 1 }
      bb.putLong(mask)
      w = 0
      while (w < WordsPerPage) { if (page(w) != 0L) bb.putLong(page(w)); w += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nPages = bb.getInt
    val m = scala.collection.mutable.LongMap.empty[Array[Long]]
    var i = 0
    while (i < nPages) {
      val base = bb.getLong
      val mask = bb.getLong
      val page = new Array[Long](WordsPerPage)
      var w = 0
      while (w < WordsPerPage) {
        if ((mask & (1L << w)) != 0L) page(w) = bb.getLong
        w += 1
      }
      m.update(base, page)
      i += 1
    }
    m
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapDistinct {
  /** 4096-bit pages: 64 words, 512 B dense — small enough that a touched
    * page never wastes much, large enough that dense key ranges stay at
    * ~1 bit/key. */
  val PageShift = 12
  val PageMask = (1L << PageShift) - 1
  val WordsPerPage: Int = (1 << PageShift) / 64

  /** `bitmap_distinct(col)` → exact distinct count (bigint). */
  def bitmap_distinct(c: Column): Column =
    GraftShims.columnOf(BitmapDistinct(GraftShims.expressionOf(c)).toAggregateExpression())
}
