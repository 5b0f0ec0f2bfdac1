package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 STREAMING SINK with the committer-spout contract on the
  * write side (the mirror of [[BatchLogSource]]'s read side): executors
  * write partition buffers, the driver commits them atomically PER EPOCH,
  * and a replayed epoch is recognized and skipped — exactly-once without
  * foreachBatch (reference contract: `ICommitterTridentSpout`
  * `storm/trident/spout/ICommitterTridentSpout.java:24-39`, state commit
  * bracket `OpaqueMap.java:97-106`).
  *
  * The registry is in-memory (the test fixture, like `MemoryMapState`); a
  * production implementation ships the same four pieces (WriteBuilder,
  * StreamingWrite, DataWriterFactory, commit/abort) against a KV service,
  * where `commit(epochId)` becomes the transactional batch put.
  *
  * Usage: `df.writeStream.format("graft.sources.KvStoreSink")
  * .option("storeId", id)` with columns (key STRING, value BIGINT).
  */
class KvStoreSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStoreSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvSinkTable(new CaseInsensitiveStringMap(properties).get("storeid"))
}

object KvStoreSink {
  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.LongType)))

  /** storeId → (committed "queryId#epoch" marks, key → value). Replay
    * detection is scoped PER QUERY RUN: epoch ids restart at 0 for every
    * new checkpoint, so a bare epoch set would make a second query writing
    * to the same store silently discard all its batches as 'replays'. */
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, (java.util.Set[String], java.util.Map[String, Long])]()

  private def store(id: String) = stores.computeIfAbsent(id, _ =>
    (java.util.concurrent.ConcurrentHashMap.newKeySet[String](),
      new java.util.concurrent.ConcurrentHashMap[String, Long]()))

  def snapshot(id: String): Map[String, Long] = store(id)._2.asScala.toMap
  def committedEpochs(id: String): Set[Long] =
    store(id)._1.asScala.map(m => m.substring(m.lastIndexOf('#') + 1).toLong).toSet
  def clear(id: String): Unit = { stores.remove(id); () }

  private[graft] def commitEpoch(id: String, queryId: String, epochId: Long,
      rows: Seq[(String, Long)]): Boolean = {
    val (epochs, kv) = store(id)
    // replayed epoch OF THIS QUERY RUN: the batch was already durably
    // applied — skip, don't double-apply (the transactional-state contract)
    if (!epochs.add(s"$queryId#$epochId")) return false
    // update-mode semantics: a re-emitted key carries its NEW TOTAL, so the
    // commit is put/overwrite per key — never an additive merge (a delta
    // store would merge; this sink's contract is totals)
    rows.foreach { case (k, v) => kv.put(k, v) }
    true
  }
}

private[sources] class KvSinkTable(storeId: String) extends Table with SupportsWrite {
  require(storeId != null, "option storeId is required")
  override def name(): String = s"kvsink($storeId)"
  override def schema(): StructType = KvStoreSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // the update-as-append marker: update mode re-emits a key with its new
    // running total each epoch, and the commit overwrites that key's slot
    new WriteBuilder with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new KvStreamingWrite(storeId, info.queryId())
      }
    }
}

/** One partition's buffered rows, shipped to the driver at epoch commit. */
private[sources] case class KvCommitMessage(rows: Seq[(String, Long)])
  extends WriterCommitMessage

private[sources] class KvStreamingWrite(storeId: String, queryId: String)
  extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new KvWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap {
      case KvCommitMessage(r) => r
      case _ => Nil
    }
    KvStoreSink.commitEpoch(storeId, queryId, epochId, rows)
    ()
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class KvWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      override def write(row: InternalRow): Unit =
        buf += ((row.getUTF8String(0).toString, row.getLong(1)))
      override def commit(): WriterCommitMessage = KvCommitMessage(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
