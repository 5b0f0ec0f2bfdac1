package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.drpc.LocalDRPC

/** Top-level builder — the `TridentTopology` analog
  * (`storm/trident/TridentTopology.java`): the object a reference user
  * starts from. Wires named streams, static state registrations, DRPC
  * streams, and multi-stream combinators over the same [[Stream]] surface.
  *
  * There is deliberately no `build()` compilation step: the reference's
  * planning pipeline (node graph → `GraphGrouper` fusion → exchange
  * placement → `SubtopologyBolt`s, TridentTopology.java:265-426) is
  * subsumed by Catalyst — a Stream IS its logical plan, and Spark fuses,
  * places exchanges, and dedups subplans at execution (SURVEY.md §4). */
class Topology(val spark: SparkSession) {
  private val drpc = new LocalDRPC(spark)

  /** `newStream(txId, spout)` — here: any DataFrame (static or streaming)
    * becomes a named tuple stream; replayability is the source's concern
    * (SURVEY.md §2.1 mapping, `graft.sources`). */
  def newStream(name: String, df: DataFrame): Stream =
    new Stream(df).named(name)

  /** `newStaticState(factory)` (TridentTopology.java:159-169) — register an
    * external keyed table for `stateQuery`. */
  def newStaticState(df: DataFrame, keys: Fields, values: Fields,
                     broadcastable: Boolean = true): StaticState =
    StaticState(df, keys, values, broadcastable)

  /** `newDRPCStream(function)` (TridentTopology.java:135-157) — register a
    * named request pipeline: for each `execute(function, args)` call the
    * args become a one-batch stream of `(args)` tuples, flow through
    * `pipeline`, and the result returns to the caller (the
    * `ReturnResultsReducer` join is the service's result assembly). */
  def newDRPCStream(function: String)(pipeline: Stream => Stream): Unit =
    drpc.register(function, args => {
      import spark.implicits._
      pipeline(new Stream(Seq(args).toDF("args"))).toDF
    })

  /** The in-process DRPC client — `LocalDRPC` (test/driver face). */
  def localDRPC: LocalDRPC = drpc

  /** `TridentTopology.merge` (first stream's field names win). */
  def merge(streams: Stream*): Stream = streams.head.merge(streams.tail: _*)

  /** `TridentTopology.join` — per-batch equi-join (see `Stream.join`). */
  def join(left: Stream, leftKeys: Fields, right: Stream, rightKeys: Fields,
           outFields: Fields, joinType: String = "inner"): Stream =
    left.join(right, leftKeys, rightKeys, outFields, joinType)
}
