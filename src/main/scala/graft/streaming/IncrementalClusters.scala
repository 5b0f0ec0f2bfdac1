package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import scala.collection.mutable

/** Streaming INCREMENTAL duplicate clusters (VERDICT r13 #3): the
  * continuous-ingest face of [[graft.functions.Dedup.duplicateClusters]].
  * Candidate pairs arrive per micro-batch (the
  * [[graft.functions.Dedup.streamingLshCandidates]] output is the natural
  * feed); each batch's edges fold into a union-find kept in the engine's
  * own exactly-once keyed-state tier — the reference's
  * `persistentAggregate` incremental-state contract
  * (`trident/Stream.java` / `GroupedStream.java:86-121`: per batch,
  * multiGet exactly the touched keys, fold, multiPut) applied to the pair
  * stream — and every component TOUCHED this batch re-emits its full
  * (id, cluster_id) membership under the new label.
  *
  * Labels match the batch face by construction: union is BY MIN, so a
  * component's root is always its minimum member id — exactly
  * `duplicateClusters`' min-label propagation fixpoint. Streaming == batch
  * over the union of arrivals (spec-pinned across ≥3 batches incl.
  * cross-batch merges).
  *
  * State model (two keyed maps):
  *  - `parents`: id → component root, kept FULLY COMPRESSED (every write
  *    re-points all affected members at the new root, so chains never
  *    exceed length one and resolution is a single multiGet round);
  *  - `members`: root → sorted member ids (what "affected components
  *    re-emit" needs — relabeling the losing component's untouched members
  *    requires its member list; a lost root keeps an empty tombstone).
  *
  * Exactly-once: the fold is IDEMPOTENT — re-unioning already-merged
  * components is a no-op and re-emission repeats the same labels — so a
  * replayed micro-batch (same txid, same pairs) converges to the same
  * state through the plain [[graft.state.NonTransactionalMap]]; the
  * commit bracket still carries the txid for commit-aware backings.
  *
  * Scale shape: state access is O(touched keys) via bulk multiGet/multiPut
  * (never a scan); per-batch driver work is O(batch pairs + affected
  * component sizes). The pair stream upstream is banded/bucketed with
  * counted caps (the LSH discipline), which bounds both terms per batch —
  * the same contract the reference's committer bolt has (it sees the
  * batch's tuples, not the corpus). Member lists are cluster-sized
  * (duplicate groups, not corpus partitions).
  */
final class IncrementalClusters(parents: graft.state.MapState[Long],
                                members: graft.state.MapState[Vector[Long]]) {

  /** Fold one micro-batch of candidate pairs into the clustering state and
    * return this batch's re-emissions: one (id, cluster_id) row for every
    * member of every component touched by the batch's edges (merged,
    * grown, or newly created — an edge internal to an existing component
    * re-emits it unchanged, keeping emission deterministic per batch). */
  def applyBatch(pairs: DataFrame, aCol: String, bCol: String,
                 txid: Long): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // bounded by the upstream candidate caps (class doc) — the batch's
    // edge list is the unit of driver coordination, as in the reference's
    // per-batch committer
    val edges: Array[(Long, Long)] = pairs
      .select(F.col(aCol).cast("long").as("a"), F.col(bCol).cast("long").as("b"))
      .where(F.col("a").isNotNull && F.col("b").isNotNull && F.col("a") =!= F.col("b"))
      .distinct()
      .as[(Long, Long)].collect()
    parents.beginCommit(Some(txid))
    members.beginCommit(Some(txid))
    // commit ONLY on success (code-review r14 #2): a fold that threw
    // mid-put must not be committed half-applied on a commit-aware
    // backing — the streaming runner replays the failed batch (same
    // txid), and the write ORDER inside the fold (members first, parents
    // second) makes any torn prefix replay-repairable: with old parents
    // still in place the replay resolves the same pre-batch roots, and
    // the already-updated winner list carries every absorbed member.
    val emitted = foldEdges(edges, parents, members)
    members.commit(Some(txid))
    parents.commit(Some(txid))
    emitted.toDF("id", "cluster_id")
  }

  /** The pure state fold behind [[applyBatch]] — one batch's edges
    * against the two keyed maps; returns the batch's re-emissions.
    * Package-private so the property suite can drive arbitrary batched
    * edge streams against a reference union-find without Spark. */
  private[graft] def foldEdges(edges: Array[(Long, Long)],
      parents: graft.state.MapState[Long],
      members: graft.state.MapState[Vector[Long]]): Seq[(Long, Long)] = {
    if (edges.isEmpty) return Seq.empty
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2))
      .toVector.distinct
    val stored = parents.multiGet(nodes.map(n => Seq(n)))
    val rootOf = mutable.Map.empty[Long, Long]
    val isNew = mutable.Set.empty[Long]
    nodes.lazyZip(stored).foreach { (n, r) =>
      rootOf(n) = r.getOrElse(n)
      if (r.isEmpty) isNew += n
    }
    // in-memory union-find over the batch's roots only, union-by-min
    val uf = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = uf.getOrElse(x, x)
      if (p == x) x else { val r = find(p); uf(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(rootOf(a)), find(rootOf(b)))
      if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb)
    }
    val involvedRoots = rootOf.values.toVector.distinct
    // a pre-existing root carries a member list by invariant; a new
    // node is its own (memberless) root
    val preExisting = involvedRoots.filterNot(isNew)
    val lists = members.multiGet(preExisting.map(r => Seq(r)))
    // a root with a MISSING or EMPTY list still contains itself —
    // the empty case only arises in a torn-write crash window
    // (tombstoned list, parents not yet repointed) and this floor
    // keeps the root from vanishing during the repairing replay
    val listOf = preExisting.lazyZip(lists).map { (r, l) =>
      r -> l.filter(_.nonEmpty).getOrElse(Vector(r))
    }.toMap
    val byFinal = involvedRoots.groupBy(find)
    val newNodesByFinal = isNew.toVector.groupBy(n => find(n))
    val memberPuts = mutable.Buffer.empty[(Seq[Any], Vector[Long])]
    val parentPuts = mutable.Buffer.empty[(Seq[Any], Long)]
    val out = mutable.Buffer.empty[(Long, Long)]
    byFinal.foreach { case (fr, roots) =>
      val merged = (roots.filterNot(isNew).flatMap(listOf) ++
        newNodesByFinal.getOrElse(fr, Vector.empty)).distinct.sorted.toVector
      // (a new node is always its own root, so "has new nodes"
      // already implies a new root in the group — one predicate)
      val changed = roots.size > 1 || newNodesByFinal.contains(fr)
      if (changed) {
        memberPuts += ((Seq(fr), merged))
        // losing roots tombstone their lists; full path compression:
        // every member points straight at the new root
        roots.filterNot(isNew).filter(_ != fr).foreach(l =>
          memberPuts += ((Seq(l), Vector.empty[Long])))
        merged.foreach(m => parentPuts += ((Seq(m), fr)))
      }
      merged.foreach(m => out += ((m, fr)))
    }
    // members BEFORE parents (torn-write repairability — class doc)
    if (memberPuts.nonEmpty)
      members.multiPut(memberPuts.map(_._1).toSeq, memberPuts.map(_._2).toSeq)
    if (parentPuts.nonEmpty)
      parents.multiPut(parentPuts.map(_._1).toSeq, parentPuts.map(_._2).toSeq)
    out.toSeq
  }

  /** The full current labeling as a DataFrame (scan-backed — the
    * `TupleCollectionGet` face of this state): one (id, cluster_id) row
    * per node ever seen. */
  def snapshot(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    parents.scanAll().map { case (k, v) =>
      (k.head.asInstanceOf[Long], v.asInstanceOf[Long])
    }.toDF("id", "cluster_id")
  }
}

object IncrementalClusters {
  /** In-memory fixture pair (the MemoryBackingMap SPI tier — swap any
    * IBackingMap-backed deployment in production). */
  def inMemory(id: String): IncrementalClusters = new IncrementalClusters(
    new graft.state.NonTransactionalMap(
      new graft.state.MemoryBackingMap[Long](s"$id-parents")),
    new graft.state.NonTransactionalMap(
      new graft.state.MemoryBackingMap[Vector[Long]](s"$id-members")))

  def clearInMemory(id: String): Unit = {
    graft.state.MemoryBackingMap.clear(s"$id-parents")
    graft.state.MemoryBackingMap.clear(s"$id-members")
  }

  /** Member lists on the scalar JSON state wire: comma-joined string
    * (the wire handles scalars only — the reference's JSON serializers
    * have the same shape). Empty vector ⇄ empty string. */
  private[streaming] val memberCodec = graft.state.ParquetBackingMap.Codec(
    v => graft.state.StateSerializers.nonTransactionalToJson(
      v.asInstanceOf[Vector[Long]].mkString(",")),
    s => {
      val joined = graft.state.StateSerializers
        .nonTransactionalFromJson(s).asInstanceOf[String]
      if (joined.isEmpty) Vector.empty[Long]
      else joined.split(',').iterator.map(_.toLong).toVector
    })

  /** DURABLE pair over [[graft.state.ParquetBackingMap]] (WAL segments +
    * parquet snapshots): the clustering survives process restart — close
    * with [[closeDurable]], re-open with another `durable(...)` and the
    * labels replay from disk (spec-pinned incl. a cross-restart merge). */
  def durable(spark: org.apache.spark.sql.SparkSession,
              dir: String): IncrementalClusters = new IncrementalClusters(
    new graft.state.NonTransactionalMap(
      graft.state.ParquetBackingMap.open[Long](spark, s"$dir/parents",
        graft.state.ParquetBackingMap.nonTransactionalCodec)),
    new graft.state.NonTransactionalMap(
      graft.state.ParquetBackingMap.open[Vector[Long]](spark, s"$dir/members",
        memberCodec)))

  /** Drop the in-process engines (simulates process exit; durable files
    * remain for the next [[durable]] open). */
  def closeDurable(dir: String): Unit = {
    graft.state.ParquetBackingMap.close(s"$dir/parents")
    graft.state.ParquetBackingMap.close(s"$dir/members")
  }
}
