package graft.drpc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DRPC over a RUNNING streaming query's state — the reference's
  * `stateQuery` against the store a live topology is updating
  * (`TridentTopology.java:428-449`; commit isolation per
  * `ICommitterTridentSpout.java:24-39`: readers see state as of the last
  * COMMITTED txid, never a half-applied batch).
  *
  * Spark's state data source ("statestore" format) reads a streaming
  * checkpoint's state at its last committed batch version — the commit log
  * is the txid bracket, so a DRPC request racing a trigger sees either the
  * previous or the new batch's state, atomically. No coordination with the
  * running query is needed (the store is MVCC by batch version), which is
  * what keeps the read path scale-free: the request is a normal Spark job
  * over the checkpoint files, not a lock on the stream.
  *
  * Usage: `registerStateQuery(drpc, spark, "wc", ck, "agg")(shape)` then
  * `DRPCService.execute("wc", args)` (or the HTTP face) serves
  * snapshot-consistent reads while the query keeps running.
  *
  * This is the ARBITRARY-PIPELINE path: each request pays one Spark job
  * (~hundreds of ms of scheduling — scale-free in state size, not
  * interactive). `MapGet`/`SnapshotGet`-class keyed lookups should use
  * the [[StateIndex]] fast path instead (driver-held index refreshed per
  * commit, microsecond reads, same answers — r14); register BOTH under
  * one name and `execute` serves fast while `executeDF` keeps this job
  * face for parity.
  */
object LiveStateDrpc {

  /** The state of the streaming query checkpointed at `checkpointDir`, as
    * of its last committed batch. `stateVarName` is the processor's handle
    * name (e.g. [[graft.streaming.StateStoreRunner.CombinerProcessor]]'s
    * "agg"); the frame carries (key, value, partition_id) structs. */
  def stateAtLastCommit(spark: SparkSession, checkpointDir: String,
                        stateVarName: String): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpointDir)
      .option("stateVarName", stateVarName)
      .load()

  /** Register DRPC function `name` whose per-request plan is `shape(state,
    * args)` over the running query's last-committed state. The state is
    * re-read per request (each request must see the latest commit). */
  def registerStateQuery(drpc: LocalDRPC, spark: SparkSession, name: String,
                         checkpointDir: String, stateVarName: String)(
                         shape: (DataFrame, String) => DataFrame): Unit =
    drpc.register(name, args =>
      shape(stateAtLastCommit(spark, checkpointDir, stateVarName), args))

  /** One state snapshot REUSED across requests between commits (VERDICT
    * r14 #3): the uncached job path pays a fresh statestore read — file
    * listing + store load + scan — per request (~hundreds of ms of it
    * fixed cost). The commit bracket already versions state, so requests
    * between two commits can legally share one materialized snapshot: this
    * handle checks the checkpoint's commit log (one cheap directory
    * listing — the commit files ARE the txid bracket), and only when a new
    * batch has COMMITTED does it re-read and re-persist the state,
    * unpersisting the stale snapshot. Readers between commits hit the
    * cached blocks — same answers as a fresh read by commit isolation
    * (spec-pinned across a commit), scheduling-only request cost. */
  final class CachedStateSnapshot(spark: SparkSession, checkpointDir: String,
                                  stateVarName: String) {
    @volatile private var cached: (Long, DataFrame) = (-1L, null)
    // resolved once: cloning the session's Hadoop conf per request would
    // put a hundreds-of-keys copy on the serving hot path
    private val commitsPath =
      new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    private val commitsFs =
      commitsPath.getFileSystem(spark.sessionState.newHadoopConf())

    /** Latest committed batch id: the max numeric entry of the commit log
      * directory (`HDFSMetadataLog` writes one file per committed batch,
      * named by batch id). -1 before the first commit. Listed through the
      * Hadoop FileSystem API so non-local checkpoints (hdfs://, s3a://,
      * file:///) invalidate correctly — a java.nio listing would silently
      * return -1 forever there and pin a stale snapshot. */
    def latestCommittedBatch(): Long = {
      if (!commitsFs.exists(commitsPath)) return -1L
      commitsFs.listStatus(commitsPath).iterator
        .map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit))
        .foldLeft(-1L)((m, n) => math.max(m, n.toLong))
    }

    /** The last-committed state, served from the persisted snapshot when
      * no new commit has landed since it was built. */
    def frame(): DataFrame = {
      val v = latestCommittedBatch()
      val c = cached
      if (c._2 != null && c._1 == v) return c._2
      synchronized {
        val c2 = cached
        if (c2._2 != null && c2._1 == v) c2._2
        else {
          val fresh = stateAtLastCommit(spark, checkpointDir, stateVarName)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          fresh.count() // materialize before serving (one read job per commit)
          cached = (v, fresh)
          if (c2._2 != null) c2._2.unpersist(blocking = false)
          fresh
        }
      }
    }

    /** Release the cached blocks (call at service shutdown). */
    def close(): Unit = synchronized {
      if (cached._2 != null) cached._2.unpersist(blocking = false)
      cached = (-1L, null)
    }
  }

  /** [[registerStateQuery]] with snapshot reuse: per-request cost is the
    * `shape` job over cached state blocks, not a fresh statestore read.
    * Returns the snapshot handle (close it at shutdown). */
  def registerStateQueryCached(drpc: LocalDRPC, spark: SparkSession,
                               name: String, checkpointDir: String,
                               stateVarName: String)(
                               shape: (DataFrame, String) => DataFrame)
      : CachedStateSnapshot = {
    val snap = new CachedStateSnapshot(spark, checkpointDir, stateVarName)
    drpc.register(name, args => shape(snap.frame(), args))
    snap
  }
}
