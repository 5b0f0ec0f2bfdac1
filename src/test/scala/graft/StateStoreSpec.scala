package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StateStoreRunner

/** transformWithState path: executor-local keyed state (RocksDB store),
  * running word count across micro-batches. */
class StateStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()

  test("running count per key is maintained in the state store across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    input.addData("the", "man", "the")

    val counts = StateStoreRunner.runningCount[String, String](
      input.toDS().flatMap(_.split(" ")), identity)
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("twscounts")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()
    q.processAllAvailable()
    input.addData("the moon")
    q.processAllAvailable()
    q.stop()

    // latest emission per key = the running total
    val latest = spark.table("twscounts").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(latest("the") == 3L)
    assert(latest("man") == 1L)
    assert(latest("moon") == 1L)
  }
}
