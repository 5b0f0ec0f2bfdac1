package graft.api

import scala.collection.mutable
import org.apache.spark.sql.types.StructField
import graft.api.Operations.FullAggregator

/** Reusable operation sub-graphs — `operation/Assembly.java` instances.
  *
  * The flagship is FirstN (`operation/builtin/FirstN.java:31-53`), which the
  * reference assembles as `partitionAggregate(topN) → global() →
  * partitionAggregate(topN)` — a hand-built partial/final top-K. On Spark
  * the idiomatic spelling is `orderBy(...).limit(n)` (Catalyst's
  * `TakeOrderedAndProject` IS that partial/final plan, and is what
  * `Stream.firstN` uses); this literal assembly exists to exercise the
  * Assembly + FullAggregator mechanism and as the template for top-K
  * variants Catalyst can't plan (custom comparators over opaque values).
  */
object Assemblies {

  /** Per-slice top-N keeper: a bounded heap whose head is the current worst
    * survivor (FirstN.java:85-124 sorted variant). Sort field must be
    * numeric; `reverse = true` keeps the largest. */
  final class TopNAggregator(n: Int, sortIdx: Int, reverse: Boolean)
    extends FullAggregator[mutable.PriorityQueue[Seq[Any]]] {
    private def key(t: Seq[Any]): Double = t(sortIdx).asInstanceOf[Number].doubleValue()
    // head = the element to evict first = the WORST of the kept set
    private def ord: Ordering[Seq[Any]] = {
      val byKey = Ordering.by[Seq[Any], Double](key)
      if (reverse) byKey.reverse else byKey // desc top-N → min-heap head
    }
    def init(): mutable.PriorityQueue[Seq[Any]] = mutable.PriorityQueue.empty(ord)
    def aggregate(q: mutable.PriorityQueue[Seq[Any]], t: Seq[Any]): mutable.PriorityQueue[Seq[Any]] = {
      q.enqueue(t)
      if (q.size > n) q.dequeue()
      q
    }
    def complete(q: mutable.PriorityQueue[Seq[Any]]): Iterator[Seq[Any]] =
      q.dequeueAll.reverseIterator
  }

  /** FirstN as the reference assembles it: partition-local heaps, a single
    * exchange of the ≤ n·P survivors, a final heap. */
  def firstN(n: Int, sortField: String, reverse: Boolean = false): Stream => Stream = { s =>
    val schema: Seq[StructField] =
      s.toDF.schema.fields.map(f => StructField(f.name, f.dataType)).toSeq
    val sortIdx = s.fields.fieldIndex(sortField)
    val agg = new TopNAggregator(n, sortIdx, reverse)
    s.partitionAggregate(s.fields, agg, schema)
      .global()
      .partitionAggregate(Fields(schema.map(_.name)), agg, schema)
  }
}
