package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom tier (SURVEY.md §4.2 (c), the one extension point
  * rounds 1-6 had not exercised): a logical plan node + planner strategy +
  * physical operator for bounded per-group top-k, injected through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Why a physical operator and not a window function: `row_number() OVER
  * (PARTITION BY g ORDER BY s) <= k` plans a full sort of EVERY group's
  * rows after the shuffle, and the shuffle itself carries every scored row.
  * This operator keeps a bounded k-heap per group on the map side, so the
  * exchange carries at most (groups-per-partition × k) rows and no sort
  * ever runs — the same partial/final contract as [[graft.functions.TopKAgg]]
  * but as a standalone relational operator that preserves the child's
  * schema instead of aggregating it into an array column.
  *
  * Planning shape (strategy below):
  *   TopKPerGroupExec(final)            — requires ClusteredDistribution(g)
  *     +- ShuffleExchange(g)            — inserted by EnsureRequirements
  *        +- TopKPerGroupExec(partial)  — any distribution, map-side prune
  *           +- child
  *
  * Both phases run the identical bounded-heap pass: partial prunes each
  * input partition to ≤ k rows per group it has seen; final sees every
  * surviving row of a group co-located and prunes to the true top k.
  * Determinism: callers put a total tiebreaker in `order` (e.g. score
  * DESC, id ASC), making the kept SET unique regardless of partitioning.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerGroup needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  import org.apache.spark.sql.{Column, DataFrame, GraftShims}
  import org.apache.spark.sql.catalyst.expressions.Ascending

  /** Column-level entry point: the top `k` rows of each group under
    * `order` (give it a total order — e.g. `score.desc, id.asc` — or the
    * kept set is partition-dependent on ties). Schema is preserved. */
  def topKPerGroup(df: DataFrame, groups: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val s = df.sparkSession
    val g = groups.map(GraftShims.catalystExpressionOf(s, _))
    val so = order.map(GraftShims.catalystExpressionOf(s, _) match {
      case ord: SortOrder => ord
      case e => SortOrder(e, Ascending)
    })
    GraftShims.dataFrameOf(s, TopKPerGroup(g, so, k, df.queryExecution.analyzed))
  }
}

/** Plans [[TopKPerGroup]] as the partial/final pair. Injected via
  * `injectPlannerStrategy` (sql/AgeDdl.scala) — Catalyst falls through to
  * builtin strategies for every other node, so the strategy is a no-op
  * outside this operator. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, order, k, child) =>
      TopKPerGroupExec(g, order, k, partial = false,
        TopKPerGroupExec(g, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "PartialTopKPerGroup" else "TopKPerGroup"

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // The final phase needs every surviving row of a group in one partition;
  // EnsureRequirements plants the hash exchange (or none, if the child is
  // already clustered on the keys — e.g. a bucketed or pre-shuffled scan).
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  protected override def doExecute(): RDD[InternalRow] = {
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val outputLocal = output
    val kLocal = k
    // Memory bound: each phase holds one ≤k heap per distinct group key seen
    // in its partition. The FINAL phase is bounded by groups-per-hash-
    // partition — the same bound ObjectHashAggregate carries, and it must
    // see each group whole, so it never flushes. The PARTIAL phase sees raw
    // input partitions, where a high-cardinality group column could grow
    // the map without limit — so it flushes (emits and clears) whenever it
    // holds `flushAt` groups. Safe: a flushed group that reappears later in
    // the partition just sends ≤k extra rows into the exchange, and the
    // final phase re-prunes to the true top k.
    val flushAt = if (partial) TopKPerGroupExec.PartialFlushGroups else Int.MaxValue
    child.execute().mapPartitions(preservesPartitioning = true, f = { iter =>
      val keyProj = UnsafeProjection.create(groupExprsLocal, outputLocal)
      // "less" = better (earlier in sort order); PriorityQueue dequeues the
      // max, i.e. the worst retained row — classic bounded-heap top-k.
      val better = RowOrdering.create(orderLocal, outputLocal)
      val heaps = scala.collection.mutable.HashMap.empty[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def pump(): Unit = {
          while (!out.hasNext && (iter.hasNext || heaps.nonEmpty)) {
            while (iter.hasNext && heaps.size < flushAt) {
              val row = iter.next()
              // keyProj reuses one output row — copy the key only when it
              // is actually inserted, not on every probe.
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(heap) =>
                  if (heap.size < kLocal) heap.enqueue(row.copy())
                  else if (better.compare(row, heap.head) < 0) { // beats worst
                    heap.dequeue(); heap.enqueue(row.copy())
                  }
                case None =>
                  val heap =
                    scala.collection.mutable.PriorityQueue.empty[InternalRow](better)
                  heap.enqueue(row.copy())
                  heaps.put(key.copy(), heap)
              }
            }
            out = heaps.valuesIterator.flatMap(_.iterator).toArray.iterator
            heaps.clear()
          }
        }
        override def hasNext: Boolean = { pump(); out.hasNext }
        override def next(): InternalRow = { pump(); out.next() }
      }
    })
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-phase flush threshold, in distinct groups held at once. At the
    * default 128k groups × k=10 × ~100 B rows the in-flight bound is ~128 MB
    * per task — comparable to a hash aggregate's fallback threshold. */
  val PartialFlushGroups: Int = 1 << 17
}
