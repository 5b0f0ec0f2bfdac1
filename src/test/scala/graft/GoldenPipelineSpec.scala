package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.api._
import graft.drpc.LocalDRPC
import graft.sources.FeederSource
import graft.state._
import graft.streaming.StreamRunner

/** The canonical reference pipeline, end to end — the 1:1 port of
  * `storm-core/test/clj/storm/trident/integration_test.clj:55-86`
  * (FIXTURES.md §A1): feeder batches → split → groupBy(word) →
  * persistentAggregate(Count) → DRPC `words` query (split args → MapGet →
  * FilterNull → Sum), asserted against the reference's exact goldens
  * including the DRPC JSON wire format. */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Topology facade: newStream → pipeline → newDRPCStream end to end") {
    import spark.implicits._
    val topology = new Topology(spark)
    val wc = topology
      .newStream("sentences",
        Seq("hello the man said", "the", "the man on the moon").toDF("sentence"))
      .flatEach(F.split(F.col("sentence"), " "), "word")
      .groupBy(Fields("word"))
      .aggregate(F.count(F.lit(1)).as("cnt"))
      .toDF
    val state = topology.newStaticState(wc, Fields("word"), Fields("cnt"))
    topology.newDRPCStream("words") { args =>
      args.flatEach(F.split(F.col("args"), " "), "word")
        .project(Fields("word"))
        .stateQuery(state, Fields("word"), Fields("cnt"))
        .filterNull(Fields("cnt"))
        .aggregate(F.sum("cnt").as("total"))
    }
    assert(topology.localDRPC.execute("words", "the man") == "[[6]]") // 4 + 2
  }

  test("word-count topology + DRPC goldens: [[2]], [[4]], [[8]]") {
    import spark.implicits._
    MemoryBackingMap.clear("golden-wc")
    val state = new OpaqueMap[Long](new MemoryBackingMap[OpaqueValue[Long]]("golden-wc"))
    val feeder = new FeederSource[String](spark)

    val words = new Stream(feeder.toDF.toDF("sentence"))
      .flatEach(F.split(F.col("sentence"), " "), "word")
      .project(Fields("word"))
    val q = StreamRunner.persistentAggregate[Long](words.toDF, Fields("word"),
      F.count(F.lit(1)).as("cnt"), _ + _, state, "golden-wc-query",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))

    val drpc = new LocalDRPC(spark)
    drpc.register("words", args => {
      val ts = new TridentState[Long](state, "golden-wc", Fields("word"), "cnt")
      val stateDf = ts.asStaticState(spark, StructType(Seq(
        StructField("word", StringType), StructField("cnt", LongType))))
      new Stream(args.split(" ").toSeq.toDF("word"))
        .stateQuery(stateDf, Fields("word"), Fields("cnt"))
        .filterNull(Fields("cnt"))
        .aggregate(F.sum("cnt").as("total"))
        .toDF
    })

    feeder.feed(Seq("hello the man said", "the"))
    q.processAllAvailable()
    assert(drpc.execute("words", "the") == "[[2]]")

    feeder.feed(Seq("the man on the moon", "where are you"))
    q.processAllAvailable()
    assert(drpc.execute("words", "the") == "[[4]]")
    assert(drpc.execute("words", "man where you the") == "[[8]]")
    q.stop()
  }
}
