package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Fields
import graft.core._
import scala.collection.mutable

// The test components live at top level: bolts are serialization-cloned
// per task, so they must not capture the (non-serializable) suite.

/** reference `testing/TestWordCounter.java`: per-task running count per
  * word, emits (word, count) — a BASIC bolt (auto-ack). */
private class TestWordCounter extends IBasicBolt {
  private var counts: mutable.Map[String, Int] = _
  def declareOutputFields: Fields = Fields("word", "count")
  override def prepare(context: TopologyContext): Unit =
    counts = mutable.Map().withDefaultValue(0)
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit = {
    val w = input.getString(0)
    counts(w) += 1
    collector.emit(Seq(w, counts(w)))
  }
}

/** reference `testing/TestGlobalCount.java`: running count of every tuple
  * seen — a RICH bolt with manual ack. */
private class TestGlobalCount extends IRichBolt {
  private var count = 0
  @transient private var col: OutputCollector = _
  def declareOutputFields: Fields = Fields("global-count")
  override def prepare(context: TopologyContext, collector: OutputCollector): Unit = {
    col = collector
    count = 0
  }
  def execute(input: CoreTuple): Unit = {
    count += 1
    col.emit(input, Seq(count))
    col.ack(input)
  }
}

/** reference `testing/TestAggregatesCounter.java`: tracks the latest count
  * per word, emits the sum across words after every input. */
private class TestAggregatesCounter extends IRichBolt {
  private var counts: mutable.Map[String, Int] = _
  @transient private var col: OutputCollector = _
  def declareOutputFields: Fields = Fields("agg-global")
  override def prepare(context: TopologyContext, collector: OutputCollector): Unit = {
    col = collector
    counts = mutable.Map()
  }
  def execute(input: CoreTuple): Unit = {
    counts(input.getString(0)) = input.getValue(1).asInstanceOf[Int]
    col.emit(input, Seq(counts.values.sum))
    col.ack(input)
  }
}

/** reference `integration_test.clj` emit-task-id bolt: emits the task
  * index for every input. */
private class EmitTaskId extends IRichBolt {
  @transient private var col: OutputCollector = _
  private var tid = -1
  def declareOutputFields: Fields = Fields("tid")
  override def prepare(context: TopologyContext, collector: OutputCollector): Unit = {
    col = collector
    tid = context.taskIndex
  }
  def execute(input: CoreTuple): Unit = {
    col.emit(input, Seq(tid))
    col.ack(input)
  }
}

/** Spout placeholder for mocked sources (only declareOutputFields runs). */
private class WordSpoutStub extends IRichSpout {
  def declareOutputFields: Fields = Fields("word")
  def nextTuple(): Unit = ()
}

/** Driver-side ack registry: the run clones spouts per task, so instance
  * state set by ack() would land on a clone — record acks statically. */
private object AckLog { val ids: mutable.Set[Any] = mutable.Set() }

/** A FixedTupleSpout analog (reference `testing/FixedTupleSpout.java`):
  * emits its tuples once with msgIds, then goes quiet; acks are recorded
  * in [[AckLog]]. */
private class LoggingFixedSpout(tuples: Seq[Seq[Any]]) extends IRichSpout {
  @transient private var col: SpoutOutputCollector = _
  private var i = 0
  def declareOutputFields: Fields = Fields("word")
  override def open(context: TopologyContext, collector: SpoutOutputCollector): Unit =
    col = collector
  def nextTuple(): Unit = if (i < tuples.size) {
    col.emit(tuples(i), s"msg$i")
    i += 1
  }
  override def ack(msgId: Any): Unit = AckLog.ids += msgId
}

/** reference `testing/NGrouping.java`: routes every tuple to the FIRST n
  * target tasks — the stock custom-grouping test fixture (multicast). */
private class NGrouping(n: Int) extends CustomStreamGrouping {
  private var targets: Seq[Int] = Seq.empty
  override def prepare(targetTasks: Seq[Int]): Unit = targets = targetTasks.take(n)
  def chooseTasks(values: Seq[Any]): Seq[Int] = targets
}

/** Custom grouping keyed on the word's LENGTH — proves chooseTasks sees
  * the tuple values, not just metadata. */
private class LengthGrouping extends CustomStreamGrouping {
  private var p = 0
  override def prepare(targetTasks: Seq[Int]): Unit = p = targetTasks.size
  def chooseTasks(values: Seq[Any]): Seq[Int] =
    Seq(values.head.asInstanceOf[String].length % p)
}

/** Identity basic bolt. */
private class IdentityWord extends IBasicBolt {
  def declareOutputFields: Fields = Fields("word")
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit =
    collector.emit(Seq(input.getValue(0)))
}

/** Basic bolt that EMITS then throws FailedException on a marker word —
  * the partial emission must be discarded with the failed tuple. */
private class FailOnPoison extends IBasicBolt {
  def declareOutputFields: Fields = Fields("word")
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit = {
    collector.emit(Seq(input.getValue(0)))
    if (input.getString(0) == "poison") throw new FailedException("bad tuple")
  }
}

/** Port of the reference's `drpc/PrepareRequest.java:32-51` multi-stream
  * shape: one input tuple (args, return-info) splits into THREE named
  * streams — (request, args) on the default stream, (request, return) on
  * "ret", (request) on "id". Deterministic request ids (input seq order)
  * instead of the reference's Random so the spec can assert exact rows. */
private class PrepareRequestBolt extends IBasicBolt {
  private var nextId = 0L
  def declareOutputFields: Fields = Fields("request", "args")
  override def declareOutputFields(d: OutputFieldsDeclarer): Unit = {
    d.declare(declareOutputFields) // ARGS_STREAM == the default stream id
    d.declareStream("ret", Fields("request", "return"))
    d.declareStream("id", Fields("request"))
  }
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit = {
    val requestId = nextId
    nextId += 1
    collector.emit(Seq(requestId, input.getString(0)))
    collector.emit("ret", Seq(requestId, input.getString(1)))
    collector.emit("id", Seq(requestId))
  }
}

/** Echoes (value, sourceStreamId) — proves subscribers see the stream id. */
private class EchoStreamId extends IBasicBolt {
  def declareOutputFields: Fields = Fields("v", "stream")
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit =
    collector.emit(Seq(input.getValue(0), input.sourceStreamId))
}

/** Counts data tuples and `__tick` system tuples separately (the
  * flush-on-tick pattern: emits the data count on each tick). */
private class TickCountingBolt extends IRichBolt {
  @transient private var col: OutputCollector = _
  private var dataSeen = 0
  def declareOutputFields: Fields = Fields("kind", "n")
  override def prepare(context: TopologyContext, collector: OutputCollector): Unit = {
    col = collector
    dataSeen = 0
  }
  def execute(input: CoreTuple): Unit = {
    if (input.sourceComponent == CoreStreams.SystemComponent &&
        input.sourceStreamId == CoreStreams.TickStream) {
      col.emit(Seq("tick", input.getLong(0)))
    } else {
      dataSeen += 1
      col.emit(Seq("data", dataSeen.toLong))
    }
    col.ack(input)
  }
}

/** Emits to a stream it never declared — must fail loudly at emit. */
private class GhostStreamBolt extends IBasicBolt {
  def declareOutputFields: Fields = Fields("w")
  def execute(input: CoreTuple, collector: BasicOutputCollector): Unit =
    collector.emit("ghost", Seq(input.getValue(0)))
}

/** Spout stub declaring the DRPC request fields. */
private class RpcSpoutStub extends IRichSpout {
  def declareOutputFields: Fields = Fields("args", "return-info")
  def nextTuple(): Unit = ()
}

/** Port of the reference's core-topology integration tests
  * (`storm-core/test/clj/backtype/storm/integration_test.clj:28-60`,
  * test-basic-topology + the multi-task distribution check) onto the
  * [[graft.core.LocalTopology]] façade: same spout input, same three
  * bolts (per-word counter on a fields grouping, global counter on a
  * global grouping, aggregates counter chained off the word counts),
  * same expected tuples. */
class CoreTopologySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("basic topology: word counter / global count / aggregates (integration_test.clj:28-45)") {
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub, parallelism = 3)
    b.setBolt("2", new TestWordCounter, 4).fieldsGrouping("1", Fields("word"))
    b.setBolt("3", new TestGlobalCount).globalGrouping("1")
    b.setBolt("4", new TestAggregatesCounter).globalGrouping("2")
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("1" -> Seq(Seq("nathan"), Seq("bob"), Seq("joey"), Seq("nathan"))))
    // spout tuples, as a multiset (ms= in the reference)
    assert(results.readTuples("1").groupBy(identity).view.mapValues(_.size).toMap ==
      Map(Seq("nathan") -> 2, Seq("bob") -> 1, Seq("joey") -> 1))
    // word counts, as a multiset: nathan counted twice in order
    assert(results.readTuples("2").groupBy(identity).view.mapValues(_.size).toMap ==
      Map(Seq("nathan", 1) -> 1, Seq("nathan", 2) -> 1,
        Seq("bob", 1) -> 1, Seq("joey", 1) -> 1))
    // global count: strictly ordered 1..4 (single task, spout order)
    assert(results.readTuples("3") == Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    // aggregates: running sum over latest per-word counts is 1,2,3,4 in
    // every arrival order the pairwise-order guarantee allows
    assert(results.readTuples("4") == Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    // basic bolt auto-acked every input; rich bolts acked manually
    assert(results.acked("2") == 4L && results.acked("3") == 4L && results.acked("4") == 4L)
    assert(results.failed.values.forall(_ == 0L))
  }

  test("shuffle grouping distributes round-robin across tasks (multi-task distribution, integration_test.clj:47-60)") {
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new EmitTaskId, 6).shuffleGrouping("1")
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("1" -> Seq.fill(6)(Seq("a"))))
    assert(results.readTuples("2").map(_.head).toSet == Set(0, 1, 2, 3, 4, 5))
  }

  test("custom groupings: NGrouping multicasts to the first n tasks (grouping_test.clj:56-79)") {
    // the reference test: spout emits [a], [b]; bolt "2" under
    // NGrouping(2) at p=4 reads each tuple twice, bolt "3" under
    // NGrouping(3) at p=6 reads each three times (multiset compare)
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new IdentityWord, 4).customGrouping("1", new NGrouping(2))
    b.setBolt("3", new IdentityWord, 6).customGrouping("1", new NGrouping(3))
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("1" -> Seq(Seq("a"), Seq("b"))))
    assert(results.readTuples("2").groupBy(identity).view.mapValues(_.size).toMap ==
      Map(Seq("a") -> 2, Seq("b") -> 2))
    assert(results.readTuples("3").groupBy(identity).view.mapValues(_.size).toMap ==
      Map(Seq("a") -> 3, Seq("b") -> 3))
  }

  test("custom grouping sees tuple VALUES: same-key tuples land on one task") {
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new EmitTaskId, 4).customGrouping("1", new LengthGrouping)
    val results = LocalTopology.completeTopology(spark, b, mockSources =
      Map("1" -> Seq(Seq("aa"), Seq("bb"), Seq("xyz"), Seq("pqr"), Seq("aa"))))
    // len-2 words share a task; len-3 words share a different one
    val byLen = results.readTuples("2").map(_.head.asInstanceOf[Int])
    assert(byLen.toSet.size == 2)
  }

  test("localOrShuffleGrouping routes like shuffle: all tasks covered, every tuple exactly once") {
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new EmitTaskId, 6).localOrShuffleGrouping("1")
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("1" -> Seq.fill(12)(Seq("a"))))
    assert(results.readTuples("2").size == 12)
    assert(results.readTuples("2").map(_.head).toSet == Set(0, 1, 2, 3, 4, 5))
  }

  test("custom grouping returning an EMPTY task list drops the tuple (reference contract)") {
    // a filtering grouping: route only len-2 words, drop the rest —
    // the reference CustomStreamGrouping contract permits empty results
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new IdentityWord, 3).customGrouping("1",
      new CustomStreamGrouping {
        def chooseTasks(values: Seq[Any]): Seq[Int] =
          if (values.head.asInstanceOf[String].length == 2) Seq(0) else Seq.empty
      })
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("1" -> Seq(Seq("aa"), Seq("xyz"), Seq("bb"), Seq("pqrs"))))
    assert(results.readTuples("2").toSet == Set(Seq("aa"), Seq("bb")))
  }

  test("custom grouping choosing an out-of-range task fails loudly") {
    val b = new TopologyBuilder
    b.setSpout("1", new WordSpoutStub)
    b.setBolt("2", new IdentityWord, 2).customGrouping("1", new NGrouping(5))
    // NGrouping(5).prepare sees only tasks 0,1 (take(5) of 2) — legal;
    // a grouping that INVENTS a task id is the loud-failure case
    val bad = new TopologyBuilder
    bad.setSpout("1", new WordSpoutStub)
    bad.setBolt("2", new IdentityWord, 2).customGrouping("1",
      new CustomStreamGrouping {
        def chooseTasks(values: Seq[Any]): Seq[Int] = Seq(7)
      })
    val e = intercept[Exception] {
      LocalTopology.completeTopology(spark, bad,
        mockSources = Map("1" -> Seq(Seq("a"))))
    }
    assert(e.getMessage != null)
  }

  test("driver-pumped rich spout: open/nextTuple/ack lifecycle, all grouping, quiescence stop") {
    AckLog.ids.clear()
    val b = new TopologyBuilder
    b.setSpout("1", new LoggingFixedSpout(Seq(Seq("x"), Seq("y"))))
    b.setBolt("2", new IdentityWord, 3).allGrouping("1")
    val results = LocalTopology.completeTopology(spark, b)
    assert(results.readTuples("1").toSet == Set(Seq("x"), Seq("y")))
    // all grouping: every task sees every tuple -> 2 tuples x 3 tasks
    assert(results.readTuples("2").size == 6)
    // batch completion == tuple-tree completion: every msgId acked
    assert(AckLog.ids == Set("msg0", "msg1"))
  }

  test("two-source bolt: per-source pairwise order survives the interleave") {
    // a bolt fed by TWO spouts must see each source's tuples in that
    // source's order (Storm's pairwise guarantee); the global-count bolt
    // emits 1..n, so per-source subsequences of its input expose any
    // order violation
    val b = new TopologyBuilder
    b.setSpout("s1", new WordSpoutStub)
    b.setSpout("s2", new WordSpoutStub)
    b.setBolt("i", new IdentityWord).globalGrouping("s1").globalGrouping("s2")
    val results = LocalTopology.completeTopology(spark, b, mockSources = Map(
      "s1" -> Seq(Seq("a1"), Seq("a2"), Seq("a3")),
      "s2" -> Seq(Seq("b1"), Seq("b2"))))
    val out = results.readTuples("i").map(_.head.asInstanceOf[String])
    assert(out.length == 5 && out.toSet == Set("a1", "a2", "a3", "b1", "b2"))
    // each source's subsequence arrives in that source's emission order
    assert(out.filter(_.startsWith("a")) == Seq("a1", "a2", "a3"))
    assert(out.filter(_.startsWith("b")) == Seq("b1", "b2"))
    // word counts across both sources: every word once, plus a shared
    // word run to check cross-source counting
    val results2 = LocalTopology.completeTopology(spark, {
      val t = new TopologyBuilder
      t.setSpout("s1", new WordSpoutStub)
      t.setSpout("s2", new WordSpoutStub)
      t.setBolt("w", new TestWordCounter, 2)
        .fieldsGrouping("s1", Fields("word")).fieldsGrouping("s2", Fields("word"))
      t
    }, mockSources = Map(
      "s1" -> Seq(Seq("x"), Seq("x")),
      "s2" -> Seq(Seq("x"))))
    // fields grouping routes every "x" to ONE task: counts reach 3
    assert(results2.readTuples("w").map(_(1)).toSet == Set(1, 2, 3))
  }

  test("FailedException in a basic bolt fails the tuple and discards its partial emissions (BasicBoltExecutor.java contract)") {
    val b = new TopologyBuilder
    b.setSpout("s", new WordSpoutStub)
    b.setBolt("f", new FailOnPoison).globalGrouping("s")
    val results = LocalTopology.completeTopology(spark, b, mockSources = Map(
      "s" -> Seq(Seq("ok1"), Seq("poison"), Seq("ok2"))))
    // the poison tuple's emission (made BEFORE the throw) must not leak
    assert(results.readTuples("f") == Seq(Seq("ok1"), Seq("ok2")))
    assert(results.acked("f") == 2L && results.failed("f") == 1L)
  }

  test("declareStream: PrepareRequest 3-way split with per-stream groupings (PrepareRequest.java:32-51)") {
    val b = new TopologyBuilder
    b.setSpout("rpc", new RpcSpoutStub)
    b.setBolt("prep", new PrepareRequestBolt).globalGrouping("rpc")
    // each subscriber picks ONE named stream of the same component
    b.setBolt("args", new EchoStreamId).shuffleGrouping("prep") // default stream
    b.setBolt("ret", new EchoStreamId).fieldsGrouping("prep", "ret", Fields("request"))
    b.setBolt("ids", new EchoStreamId, 2).globalGrouping("prep", "id")
    val results = LocalTopology.completeTopology(spark, b, mockSources = Map(
      "rpc" -> Seq(Seq("q1", "host-a"), Seq("q2", "host-b"))))
    // the three streams carry the split payloads with shared request ids
    assert(results.readTuples("prep") == Seq(Seq(0L, "q1"), Seq(1L, "q2")))
    assert(results.readTuples("prep", "ret") ==
      Seq(Seq(0L, "host-a"), Seq(1L, "host-b")))
    assert(results.readTuples("prep", "id") == Seq(Seq(0L), Seq(1L)))
    // subscribers saw only their stream, with the right source stream id
    assert(results.readTuples("args").map(_(1)).toSet == Set("default"))
    assert(results.readTuples("args").map(_(0)).toSet == Set(0L, 1L))
    assert(results.readTuples("ret").map(_(1)).toSet == Set("ret"))
    assert(results.readTuples("ids").map(_(1)).toSet == Set("id"))
    assert(results.readTuples("ids").size == 2) // global: one task got both
    // default-stream alias: readTuples(c) == readTuples(c, "default")
    assert(results.readTuples("prep") == results.readTuples("prep", "default"))
  }

  test("subscribing to an undeclared stream fails loudly before any work") {
    val b = new TopologyBuilder
    b.setSpout("s", new WordSpoutStub)
    b.setBolt("x", new IdentityWord).shuffleGrouping("s", "nope")
    val e = intercept[IllegalArgumentException] {
      LocalTopology.completeTopology(spark, b, Map("s" -> Seq(Seq("a"))))
    }
    assert(e.getMessage.contains("undeclared stream s/nope"))
    // emitting to an undeclared stream also fails loudly
    val c = new TopologyBuilder
    c.setSpout("s", new WordSpoutStub)
    c.setBolt("x", new GhostStreamBolt).shuffleGrouping("s")
    intercept[Exception] {
      LocalTopology.completeTopology(spark, c, Map("s" -> Seq(Seq("a"))))
    }
  }

  test("tick tuples: conf-driven __system/__tick system tuples reach bolts (executor.clj:295-312)") {
    val b = new TopologyBuilder
    b.setSpout("s", new WordSpoutStub)
    b.setBolt("t", new TickCountingBolt).globalGrouping("s")
    val results = LocalTopology.completeTopology(spark, b,
      mockSources = Map("s" -> Seq(Seq("a"), Seq("b"), Seq("c"))),
      conf = Map(CoreStreams.TickFreqConf -> 10),
      simulatedTimeSecs = 30L)
    // 3 data tuples in order, then 30s/10s = 3 quiescent-time ticks
    // carrying the configured rate (reference tick values = [freq-secs])
    assert(results.readTuples("t") == Seq(
      Seq("data", 1L), Seq("data", 2L), Seq("data", 3L),
      Seq("tick", 10L), Seq("tick", 10L), Seq("tick", 10L)))
    // ticks are acked like any tuple
    assert(results.acked("t") == 6L)
    // no conf -> no ticks, even with simulated time
    val r2 = LocalTopology.completeTopology(spark, b,
      mockSources = Map("s" -> Seq(Seq("a"))), simulatedTimeSecs = 30L)
    assert(r2.readTuples("t") == Seq(Seq("data", 1L)))
  }

  test("builder validation: duplicate ids, direct grouping, cycles") {
    val b = new TopologyBuilder
    b.setSpout("s", new WordSpoutStub)
    intercept[IllegalArgumentException] { b.setSpout("s", new WordSpoutStub) }
    intercept[UnsupportedOperationException] {
      b.setBolt("d", new IdentityWord).directGrouping("s")
    }
    val c = new TopologyBuilder
    c.setSpout("s", new WordSpoutStub)
    c.setBolt("a", new IdentityWord).shuffleGrouping("b")
    c.setBolt("b", new IdentityWord).shuffleGrouping("a")
    intercept[IllegalArgumentException] {
      LocalTopology.completeTopology(spark, c, Map("s" -> Seq(Seq("x"))))
    }
  }
}
