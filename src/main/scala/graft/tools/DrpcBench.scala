package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone runner for the DRPC-over-live-state latency drill
  * ([[Drills.drpcStateQuery]]) across state sizes — the measured backing
  * for the "scale-free read path" claim (VERDICT r6 task #4). The bench
  * records the largest size under `drpc_statequery_ms`; this tool prints
  * the full curve.
  *
  * Usage: `sbt "runMain graft.tools.DrpcBench [sizes,comma,separated]"`
  */
object DrpcBench {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("10000,100000,1000000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sizes.foreach { n =>
      val (meanMs, maxMs, setupSec) = Drills.drpcStateQuery(spark, n, requests = 8)
      println(f"[drpc] keys=$n%8d setup=$setupSec%6.1fs request mean=$meanMs%7.1fms max=$maxMs%7.1fms")
    }
    // the KEYED FAST PATH's own curve (r14): index build (one applyDelta
    // of the full key set — the worst-case delta; steady-state deltas are
    // per-batch churn) and single-thread lookup cost vs key count — the
    // numbers behind "a driver-held index serves 1M+ keys in microseconds"
    sizes.foreach { n =>
      val index = new graft.drpc.StateIndex[String, Long]
      val entries = (0 until n).map(i => (f"k$i%09d", i.toLong))
      val b0 = System.nanoTime()
      index.applyDelta(0L, entries)
      val buildS = (System.nanoTime() - b0) / 1e9
      val lookups = 1000000
      val l0 = System.nanoTime()
      var i = 0
      var hits = 0L
      while (i < lookups) {
        if (index.get(f"k${i % n}%09d").isDefined) hits += 1
        i += 1
      }
      val perNs = (System.nanoTime() - l0).toDouble / lookups
      require(hits == lookups, s"missed keys: $hits/$lookups")
      println(f"[drpcfast] keys=$n%8d build=$buildS%6.2fs lookup=$perNs%7.0f ns " +
        f"(${1e9 / perNs}%.0f lookups/s single-thread)")
    }
    // the EVICTION (cache) tier's curve (r15): same key count but a
    // maxKeys budget at half, driven with 20 churn deltas past the bound
    // — measures the VectorMap move-to-end + tombstone-compaction cost
    // per delta and the lookup cost of the cache-shaped index. The
    // lookups mix hits and (authoritative-miss-impossible) evicted keys.
    sizes.foreach { n =>
      val budget = math.max(1, n / 2)
      val index = new graft.drpc.StateIndex[String, Long](
        maxKeys = budget, evictOldest = true)
      val b0 = System.nanoTime()
      index.applyDelta(0L, (0 until n).map(i => (f"k$i%09d", i.toLong)))
      val buildS = (System.nanoTime() - b0) / 1e9
      // steady-state churn: 20 deltas each touching budget/10 keys
      val churn = math.max(1, budget / 10)
      val c0 = System.nanoTime()
      (1 to 20).foreach { d =>
        index.applyDelta(d.toLong,
          (0 until churn).map(i => (f"k${(d * 31 + i) % n}%09d", i.toLong)))
      }
      val perDeltaMs = (System.nanoTime() - c0) / 1e6 / 20
      val lookups = 1000000
      val l0 = System.nanoTime()
      var i = 0
      var hits = 0L
      while (i < lookups) {
        if (index.get(f"k${i % n}%09d").isDefined) hits += 1
        i += 1
      }
      val perNs = (System.nanoTime() - l0).toDouble / lookups
      println(f"[drpcevict] keys=$n%8d budget=$budget%8d build=$buildS%6.2fs " +
        f"churn(${churn}/delta)=$perDeltaMs%7.1fms/delta lookup=$perNs%7.0f ns " +
        f"hitrate=${hits * 100.0 / lookups}%.0f%% evicted=${index.evictedCount}")
    }
    spark.stop()
  }
}
