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
}
