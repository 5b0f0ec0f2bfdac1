package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Fields
import graft.state._
import graft.streaming.StreamRunner

/** The custom DataSourceV2 source: transactional-spout replay contract +
  * end-to-end streaming through persistentAggregate. */
class BatchLogSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("same offset range always yields the same tuples (ITridentSpout contract)") {
    BatchLog.drop("contract"); BatchLog.create("contract")
    BatchLog.append("contract", Seq("a", "b"))
    BatchLog.append("contract", Seq("c"))
    val stream = new BatchLogStream("contract")
    def read(s: Long, e: Long): Seq[String] =
      stream.planInputPartitions(BatchLogOffset(s), BatchLogOffset(e)).flatMap { p =>
        val r = BatchLogReaderFactory.createReader(p)
        val buf = scala.collection.mutable.Buffer[String]()
        while (r.next()) buf += r.get().getUTF8String(0).toString
        buf
      }.toSeq
    val first = read(0, 2)
    BatchLog.append("contract", Seq("d", "e")) // log grows...
    assert(read(0, 2) == first)                // ...replay of [0,2) is identical
    assert(stream.latestOffset() == BatchLogOffset(3L))
    assert(read(2, 3) == Seq("d", "e"))
  }

  test("end-to-end: readStream over the custom source into exactly-once state") {
    BatchLog.drop("e2e"); BatchLog.create("e2e")
    BatchLog.append("e2e", Seq("hello the man said", "the"))
    MemoryBackingMap.clear("bl-wc")
    val state = new OpaqueMap[Long](new MemoryBackingMap[OpaqueValue[Long]]("bl-wc"))
    val df = spark.readStream.format("graft.sources.BatchLogProvider")
      .option("log", "e2e").load()
    val words = df.select(F.explode(F.split(F.col("value"), " ")).as("word"))
    val q = StreamRunner.persistentAggregate[Long](words, Fields("word"),
      F.count(F.lit(1)).as("cnt"), _ + _, state, "bl-test",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()
    BatchLog.append("e2e", Seq("the man on the moon"))
    q.processAllAvailable()
    q.stop()
    val snap = MemoryBackingMap.snapshot[OpaqueValue[Long]]("bl-wc")
    assert(snap(Seq("the")).curr == 4L)
    assert(snap(Seq("moon")).curr == 1L)
  }
}
