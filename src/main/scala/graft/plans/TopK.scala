package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: grouped top-K as a native physical
  * operator — logical node → strategy → two-stage exec, the (c) tier of the
  * custom-operator ladder (expressions being (b)).
  *
  * Why not the window form (`row_number over (partition by k order by o)
  * <= n` — what `GroupedStream.firstN` uses): the window operator SORTS
  * every partition's full data on (key, order) before discarding all but K
  * rows per key. This operator keeps a bounded heap per key instead:
  *
  *  - partial stage, before any exchange: each input partition reduces to
  *    at most K rows per key — the shuffle then moves only survivors, the
  *    same partial-aggregation shape `HashAggregate` uses (and the
  *    reference's own grouped FirstN assembly:
  *    `storm/trident/operation/builtin/FirstN.java:41-53` single-reducer
  *    equivalent);
  *  - final stage, after a hash exchange on the key (EnsureRequirements
  *    inserts it from `requiredChildDistribution`): merge the per-partition
  *    survivors, O(rows·log K) with no sort.
  *
  * At 100 TB the difference is the shuffle: full data vs ≤ K·keys rows.
  */
object TopK {

  /** Logical marker node; all expressions pre-resolved against the child.
    * `distinct` = keep the k best rows DISTINCT UNDER THE SORT ORDER —
    * order-equal rows collapse to one survivor INSIDE the partial heap, so
    * a KMV caller needs no `.distinct()` pre-pass and the exchange moves
    * ≤ k·partitions rows per key no matter how duplicated the input is. */
  case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
      distinct: Boolean, child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
      copy(child = newChild)
  }

  /** Shared heap pass: reduce an iterator to ≤ k rows per key. The heap is
    * max-first under the sort order, so the head is the current worst
    * survivor and a better row evicts it in O(log k). When `emitSorted`,
    * each key's survivors are emitted in the SortOrder (cheap: ≤ k rows per
    * key, already heap-ordered) — the final stage uses this so callers see
    * rank order within each group, matching the window `row_number` form.
    * When `distinct`, the per-key structure is a TreeSet under the same
    * ordering: an order-equal row is a no-op insert (O(log k) dedupe), so
    * duplicates neither occupy slots nor shift the kth survivor. */
  private def heapPerKey(iter: Iterator[InternalRow], keys: Seq[Expression],
      order: Seq[SortOrder], k: Int, output: Seq[Attribute],
      distinct: Boolean, emitSorted: Boolean = false): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val ord = RowOrdering.create(order, output)
    import scala.jdk.CollectionConverters._
    if (distinct) {
      val sets = new java.util.HashMap[InternalRow, scala.collection.mutable.TreeSet[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var set = sets.get(key)
        if (set == null) {
          set = scala.collection.mutable.TreeSet.empty[InternalRow](ord)
          sets.put(key.copy(), set)
        }
        if (set.size < k) set.add(row.copy())
        else if (ord.lt(row, set.last)) {
          // add() is false when an order-equal row already survives
          if (set.add(row.copy())) set.remove(set.last)
        }
      }
      // TreeSet iterates ascending = rank order already
      sets.values().iterator().asScala.flatMap(_.iterator)
    } else {
      val heaps = new java.util.HashMap[InternalRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      if (emitSorted)
        // dequeueAll drains worst-first (max-first heap); reverse = rank order
        heaps.values().iterator().asScala.flatMap(_.dequeueAll.reverseIterator)
      else heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  /** Pre-shuffle stage: per input partition, keep ≤ k rows per key. */
  case class TopKPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
      k: Int, distinct: Boolean, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override protected def doExecute(): RDD[InternalRow] =
      child.execute().mapPartitions(heapPerKey(_, keys, order, k, output, distinct))
    override protected def withNewChildInternal(c: SparkPlan): TopKPartialExec =
      copy(child = c)
  }

  /** Post-shuffle stage: all survivors of one key are co-located (the
    * required clustering makes EnsureRequirements insert the hash
    * exchange); merge them into the final top-K. */
  case class TopKFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
      k: Int, distinct: Boolean, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      // no keys = global top-K: every partial survivor must reach ONE task
      if (keys.isEmpty) AllTuples :: Nil
      else ClusteredDistribution(keys) :: Nil
    override protected def doExecute(): RDD[InternalRow] =
      child.execute().mapPartitions(
        heapPerKey(_, keys, order, k, output, distinct, emitSorted = true))
    override protected def withNewChildInternal(c: SparkPlan): TopKFinalExec =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(keys, order, k, distinct, child) =>
        TopKFinalExec(keys, order, k, distinct,
          TopKPartialExec(keys, order, k, distinct, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Register the strategy on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Grouped top-K through the native operator: the `k` rows per key
    * ranking first by `orderCol` (descending when `desc`), ties broken by
    * `tieBreak` ascending. Semantically identical to the window
    * `row_number <= k` form; physically heap-based with partial reduction
    * before the shuffle. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      desc: Boolean, tieBreak: Seq[String], k: Int,
      distinct: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order =
      SortOrder(attr(orderCol), if (desc) Descending else Ascending) +:
        tieBreak.map(t => SortOrder(attr(t), Ascending))
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      TopKPerKey(keyCols.map(attr), order, k, distinct, analyzed))
  }
}
