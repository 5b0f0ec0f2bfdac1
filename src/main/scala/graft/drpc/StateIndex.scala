package graft.drpc

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import scala.collection.immutable.HashMap

/** Driver-held keyed index over a streaming query's COMMITTED state — the
  * DRPC fast path (VERDICT r13 #1). The reference's DRPC contract is
  * millisecond-scale interactive lookups against live topology state
  * (`daemon/drpc.clj:68` blocking execute served by `DRPCSpout.java:101-143`
  * polling against in-memory `MemoryMapState`); routing every `MapGet`-class
  * request through a full Spark job (the [[LiveStateDrpc]] statestore read)
  * pays 10²-10³× that in scheduling alone. This index restores the
  * reference's serving shape: keyed reads answer from driver memory, the
  * Spark-job path stays for arbitrary pipelines.
  *
  * Consistency: the index holds an IMMUTABLE map swapped atomically under a
  * version — a reader always sees state as of one completed delta
  * application, never a half-applied batch (the `ICommitterTridentSpout`
  * commit-isolation contract, same as the statestore read path). Writers
  * (the per-commit delta) pay O(delta) structural-sharing updates, readers
  * are lock-free.
  *
  * Refresh-on-commit: `update`-mode streaming output IS the per-commit
  * delta (exactly the keys whose state changed this batch, carrying their
  * new ABSOLUTE values), so a `foreachBatch` hook ([[StateIndex.foldBatch]])
  * maintains the index at per-batch cost proportional to churn, not state
  * size. Values must be absolute (a running count, a snapshot), never
  * increments: `foreachBatch` may REPLAY a batch after failure, and
  * absolute-value upserts are idempotent where increments would
  * double-apply.
  *
  * Scale contract: the index holds the queried key universe in DRIVER
  * memory — the same bound the reference's in-memory `MemoryMapState`
  * serving tier has (worker heap). State beyond driver memory keeps the
  * scale-free job path ([[LiveStateDrpc.registerStateQuery]]); the two
  * paths answer identically by construction (spec-pinned), so routing is a
  * deployment choice, not a semantics one.
  */
final class StateIndex[K, V](maxKeys: Int = Int.MaxValue) {
  require(maxKeys > 0, s"maxKeys must be > 0, got $maxKeys")
  @volatile private var snap: (Long, HashMap[K, V]) = (-1L, HashMap.empty)

  /** Apply one committed batch's delta atomically. Re-applying the same
    * delta (a foreachBatch replay) is a no-op by idempotency of
    * absolute-value upserts; versions only move forward. Throws LOUDLY
    * (state unchanged, readers keep serving the prior version) when the
    * delta would push the index past `maxKeys` — the driver-memory guard:
    * a key universe that outgrows its budget must move to the job path
    * (or TTL its state upstream), not silently swell the driver. */
  def applyDelta(batchId: Long, updates: IterableOnce[(K, V)]): Unit =
    synchronized {
      val (v, m) = snap
      val next = m ++ updates
      if (next.size > maxKeys)
        throw new IllegalStateException(
          s"StateIndex exceeded maxKeys=$maxKeys (would hold ${next.size}): " +
          "the keyed fast path serves driver-resident state only — route " +
          "this function through the LiveStateDrpc job path or bound the " +
          "key universe (TTL) upstream")
      snap = (math.max(v, batchId), next)
    }

  /** Lock-free read against the last completed delta application. */
  def get(key: K): Option[V] = snap._2.get(key)

  /** Highest batch id applied so far (-1 before any delta). */
  def version: Long = snap._1

  def size: Int = snap._2.size

  /** The whole index at one version — for snapshot-class (whole-state)
    * DRPC functions and for parity checks. */
  def snapshot: (Long, Map[K, V]) = snap
}

object StateIndex {

  /** The `foreachBatch` hook: fold one update-mode micro-batch (the
    * commit's changed keys with their new absolute values) into the
    * index. The collect is bounded by the BATCH's churn, not state size. */
  def foldBatch[K, V](index: StateIndex[K, V])(
      batch: Dataset[(K, V)], batchId: Long): Unit =
    index.applyDelta(batchId, batch.collect())

  /** Recovery/bootstrap path: load the FULL committed state of a
    * checkpoint into the index via the statestore source (one Spark job;
    * the per-commit path afterwards is [[foldBatch]]). Use after a driver
    * restart, before re-attaching the delta hook. `version` stamps the
    * loaded snapshot (pass the restart batch id). */
  def bootstrap[K, V](index: StateIndex[K, V], spark: SparkSession,
                      checkpointDir: String, stateVarName: String,
                      version: Long)(extract: Row => (K, V)): Unit = {
    val rows = LiveStateDrpc
      .stateAtLastCommit(spark, checkpointDir, stateVarName).collect()
    index.applyDelta(version, rows.iterator.map(extract).toSeq)
  }
}
