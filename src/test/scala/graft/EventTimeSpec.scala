package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Event-time streaming (beyond the reference, which has no event time —
  * SURVEY.md §2.10): watermarked tumbling windows and
  * flatMapGroupsWithState custom state, the two Structured Streaming
  * primitives the engine's streaming tier builds on. */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window: aggregates finalize, too-late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(F.window($"ts", "10 minutes"), $"k")
      .agg(F.count(F.lit(1)).as("cnt"))
      .select($"window.start".as("w"), $"k", $"cnt")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm")
      .trigger(Trigger.ProcessingTime(0L)).start()

    input.addData((ts(1), "a"), (ts(4), "a"))
    q.processAllAvailable()
    // advance event time past window-end + watermark → [10:00,10:10) finalizes
    input.addData((ts(21), "b"))
    q.processAllAvailable()
    // this event is behind the watermark → dropped, never appears
    input.addData((ts(2), "late"))
    q.processAllAvailable()
    input.addData((ts(40), "c"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wm").as[(Timestamp, String, Long)].collect().toSet
    assert(rows.contains((ts(0), "a", 2L)))
    assert(!rows.exists(_._2 == "late"))
  }

  test("streaming sessionize: session_window merges within gap, finalizes past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = graft.functions.Temporal.sessionizeStream(
      input.toDF().toDF("u", "ts"), "u", "ts",
      gap = "10 minutes", delayThreshold = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess")
      .trigger(Trigger.ProcessingTime(0L)).start()

    // u=a: 10:00 and 10:05 chain into one session; 10:30 starts a new one
    input.addData(("a", ts(0)), ("a", ts(5)), ("a", ts(30)))
    q.processAllAvailable()
    // watermark far ahead → both of a's sessions close and emit
    input.addData(("z", ts(59)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess")
      .as[(String, Timestamp, Timestamp, Long)].collect()
      .filter(_._1 == "a").map { case (u, s, e, n) => (u, s, e, n) }.toSet
    assert(rows == Set(
      ("a", ts(0), ts(15), 2L),   // end = last event 10:05 + 10 min gap
      ("a", ts(30), ts(40), 1L)))
  }

  test("dropDuplicatesWithinWatermark: cross-batch dup ids collapse while in state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww")
      .trigger(Trigger.ProcessingTime(0L)).start()

    input.addData((1L, ts(0)), (2L, ts(1)))
    q.processAllAvailable()
    input.addData((1L, ts(2)))           // dup of id 1, later batch → dropped
    q.processAllAvailable()
    input.addData((3L, ts(5)))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("ddww").as[(Long, Timestamp)].collect().map(_._1).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L)) // each id exactly once
  }

  test("tick tuples: idle keys emit a timeout tuple when the watermark passes (timer analog)") {
    // the reference's tick tuples (executor.clj:295-312) = periodic per-key
    // callbacks; the Spark-native mechanism is state timeouts driven by the
    // watermark clock
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    def update(key: String, rows: Iterator[(String, Timestamp)],
               state: GroupState[Long]): Iterator[(String, String, Long)] = {
      if (state.hasTimedOut) {
        val n = state.get
        state.remove()
        Iterator.single((key, "tick", n))
      } else {
        val n = state.getOption.getOrElse(0L) + rows.size
        state.update(n)
        // tick if no activity for 5 minutes of event time
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 5 * 60 * 1000)
        Iterator.single((key, "data", n))
      }
    }
    val out = input.toDS().toDF("k", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("ticks")
      .trigger(Trigger.ProcessingTime(0L)).start()

    input.addData(("a", ts(0)), ("a", ts(1)))
    q.processAllAvailable()
    input.addData(("b", ts(30)))          // watermark → 10:30, far past a's timeout
    q.processAllAvailable()
    input.addData(("c", ts(31)))          // next batch fires a's pending timeout
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ticks").as[(String, String, Long)].collect().toSet
    assert(rows.contains(("a", "data", 2L)))
    assert(rows.contains(("a", "tick", 2L))) // the timeout tuple, with final state
  }

  test("flatMapGroupsWithState maintains custom per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    // running (count, max) per key — arbitrary state beyond built-in aggs
    def update(key: String, rows: Iterator[(String, Double)],
               state: GroupState[(Long, Double)]): Iterator[(String, Long, Double)] = {
      var (n, mx) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
      rows.foreach { r => n += 1; mx = math.max(mx, r._2) }
      state.update((n, mx))
      Iterator.single((key, n, mx))
    }
    val out = input.toDS().groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("fmgs")
      .trigger(Trigger.ProcessingTime(0L)).start()

    input.addData(("a", 1.0), ("a", 5.0), ("b", 2.0))
    q.processAllAvailable()
    input.addData(("a", 3.0))
    q.processAllAvailable()
    q.stop()

    val latest = spark.table("fmgs").as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(rs => rs.maxBy(_._2)).toMap
    assert(latest("a") == (("a", 3L, 5.0)))
    assert(latest("b") == (("b", 1L, 2.0)))
  }
}
