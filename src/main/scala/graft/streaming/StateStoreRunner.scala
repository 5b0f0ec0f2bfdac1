package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Scale-native keyed state over Spark's state store —
  * `persistentAggregate` via `transformWithState` (SURVEY.md §7.1 path (a)).
  *
  * Where [[StreamRunner]] drives an external `IBackingMap` (the reference's
  * MapState SPI, exactly-once via txid wrappers), this path keeps per-key
  * state in the executor-local store (RocksDB provider, changelog in the
  * checkpoint): no external round-trips, state co-partitioned with the
  * shuffle, exactly-once via the checkpoint's version log rather than
  * value-level txids. Emits the updated (key, value) on every change —
  * `TridentState.newValuesStream` in Update mode.
  *
  * Requires
  * `spark.sql.streaming.stateStore.providerClass=
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
  */
object StateStoreRunner {

  /** CombinerAggregator fold per key: state ← combine(state, init(row)). */
  class CombinerProcessor[K, V](init: V => Long, combine: (Long, Long) => Long)
    extends StatefulProcessor[K, V, (K, Long)] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("agg", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[V],
                                 timerValues: TimerValues): Iterator[(K, Long)] = {
      var acc = if (state.exists()) state.get() else 0L
      rows.foreach(r => acc = combine(acc, init(r)))
      state.update(acc)
      Iterator.single((key, acc))
    }
  }

  /** `groupBy(key).persistentAggregate(Count)` on the state store: emits the
    * running count per key each batch. */
  def runningCount[K: Encoder, V](grouped: Dataset[V], key: V => K)
                                 (implicit outEnc: Encoder[(K, Long)]): Dataset[(K, Long)] =
    grouped.groupByKey(key)
      .transformWithState(new CombinerProcessor[K, V](_ => 1L, _ + _),
        TimeMode.None(), OutputMode.Update())

  /** Generic combiner fold (long-valued) with a per-row init. */
  def runningFold[K: Encoder, V](grouped: Dataset[V], key: V => K, init: V => Long,
                                 combine: (Long, Long) => Long)
                                (implicit outEnc: Encoder[(K, Long)]): Dataset[(K, Long)] =
    grouped.groupByKey(key)
      .transformWithState(new CombinerProcessor[K, V](init, combine),
        TimeMode.None(), OutputMode.Update())
}
