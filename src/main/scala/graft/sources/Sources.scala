package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

/** Source tier — the Spark-native mapping of the reference's spout
  * hierarchy (SURVEY.md §2.1).
  *
  * The reference's spout contracts are replayability contracts:
  *
  *  - `ITridentSpout` / `IPartitionedTridentSpout` (exact same batch per
  *    txid, per-partition metadata) ≡ Structured Streaming's offset log:
  *    any source with deterministic per-offset-range replay (files, Kafka,
  *    rate). The checkpoint's offset log IS the coordinator metadata store.
  *  - `IOpaquePartitionedTridentSpout` (replay may differ) ≡ any
  *    at-least-once source + the opaque state tier downstream.
  *  - `IBatchSpout` (programmatic batches, replayable by batchId) ≡
  *    [[FeederSource]] below (MemoryStream with explicit batch feeding).
  *  - `RichSpoutBatchExecutor` (non-replayable spout → timed batches) ≡
  *    the rate source.
  *  - `DRPCSpout` ≡ `graft.drpc.LocalDRPC` (SURVEY.md §2.11).
  */
object Sources {

  /** Streaming parquet directory source — the workhorse for file-backed
    * pipelines; exact-replay via the file-listing offset log. */
  def parquetStream(spark: SparkSession, path: String,
                    schemaFrom: Option[String] = None): DataFrame = {
    val schema = spark.read.parquet(schemaFrom.getOrElse(path)).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Rate source — `RichSpoutBatchExecutor`-style timed batches of
    * synthetic tuples (`timestamp`, `value`). */
  def rate(spark: SparkSession, rowsPerSecond: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Static table as a bounded "stream" — batch parity mode: the same
    * pipeline plan runs on it unchanged (SURVEY.md §7.1). */
  def staticTable(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV source, batch or streaming face — schema REQUIRED (inference scans
    * the data twice and is banned at scale; `PERMISSIVE` keeps malformed
    * rows in `_corrupt_record` instead of failing the 100 TB job at row
    * 3 billion). */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType,
          header: Boolean = true, streaming: Boolean = false): DataFrame = {
    val opts = Map("header" -> header.toString, "mode" -> "PERMISSIVE")
    if (streaming) spark.readStream.options(opts).schema(schema).csv(path)
    else spark.read.options(opts).schema(schema).csv(path)
  }

  /** JSON-lines source, batch or streaming face — same explicit-schema and
    * PERMISSIVE discipline as [[csv]]. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType,
            streaming: Boolean = false): DataFrame =
    if (streaming) spark.readStream.schema(schema).json(path)
    else spark.read.schema(schema).json(path)
}

/** `FeederBatchSpout`/`IBatchSpout` analog: programmatic batch feeding over
  * `MemoryStream` — each `feed` is one micro-batch, replayable by the
  * stream's own offset tracking (`jvm/storm/trident/testing/
  * FeederBatchSpout.java`, `IBatchSpout.java:33`). */
final class FeederSource[A: Encoder](spark: SparkSession) {
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val stream = MemoryStream[A]
  def feed(batch: Seq[A]): Unit = { stream.addData(batch); () }
  def toDF: DataFrame = stream.toDF()
  def toDS: Dataset[A] = stream.toDS()
}

/** `ISpout`/`IRichSpout` — the pull-based source SPI
  * (`jvm/backtype/storm/spout/ISpout.java`: `open`/`nextTuple`/`ack`/`fail`).
  * `nextTuple` returns None when nothing is available right now (the
  * reference's empty-emit sleep). */
trait RichSpout[A] extends Serializable {
  def open(): Unit = ()
  def nextTuple(): Option[A]
  def ack(tuple: A): Unit = ()
  def fail(tuple: A): Unit = ()
  def close(): Unit = ()
}

/** `RichSpoutBatchExecutor` (`jvm/storm/trident/spout/
  * RichSpoutBatchExecutor.java:198` lines total) — adapts a plain
  * non-replayable [[RichSpout]] into batched micro-batch input: each
  * `pump()` pulls up to `maxBatchSize` tuples from `nextTuple` into ONE
  * micro-batch (stopping early when the spout runs dry), and the batch is
  * acked after the downstream commit succeeds, or failed back to the spout
  * otherwise — the reference's non-transactional at-least-once contract
  * (pulled tuples cannot be re-pulled, so exactly-once needs a replayable
  * source like [[BatchLogProvider]] instead). */
final class RichSpoutBatchExecutor[A: Encoder](spark: SparkSession,
    spout: RichSpout[A], maxBatchSize: Int) {
  private val feeder = new FeederSource[A](spark)
  private var opened = false
  private var inFlight: Vector[Seq[A]] = Vector.empty

  /** Pull the next batch from the spout; returns the batch size (0 = dry). */
  def pump(): Int = {
    if (!opened) { spout.open(); opened = true }
    val buf = Vector.newBuilder[A]
    var n = 0
    var dry = false
    while (n < maxBatchSize && !dry) {
      spout.nextTuple() match {
        case Some(t) => buf += t; n += 1
        case None => dry = true
      }
    }
    val batch = buf.result()
    if (batch.nonEmpty) { feeder.feed(batch); inFlight :+= batch }
    batch.size
  }

  /** Commit hook: ack every tuple of the oldest in-flight batch (call after
    * the downstream sink commits it), or fail them back on error. */
  def ackOldest(): Unit = takeOldest().foreach(_.foreach(spout.ack))
  def failOldest(): Unit = takeOldest().foreach(_.foreach(spout.fail))
  private def takeOldest(): Option[Seq[A]] = {
    val h = inFlight.headOption
    if (h.isDefined) inFlight = inFlight.tail
    h
  }

  def toDF: DataFrame = feeder.toDF
  def toDS: Dataset[A] = feeder.toDS
  def stop(): Unit = if (opened) spout.close()
}

/** Operational metrics — the `backtype.storm.metric.api` tier (CountMetric,
  * ReducedMetric/MeanReducer, CombinedMetric) re-expressed as `observe`
  * columns: Spark evaluates them inside the existing pass (no extra scan)
  * and surfaces values per batch via `QueryExecutionListener` /
  * `StreamingQueryListener`. */
object Metrics {
  /** Attach count/sum/mean observations to a frame under `name`. */
  def observed(df: DataFrame, name: String, valueCol: String): DataFrame =
    df.observe(name,
      F.count(F.lit(1)).as("count_metric"),
      F.sum(F.col(valueCol)).as("sum_metric"),
      F.avg(F.col(valueCol)).as("mean_metric"))
}
