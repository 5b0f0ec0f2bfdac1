package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared bench/tuning drills — ONE spelling of the state-store word-count
  * drive, used by both the recorded bench entry
  * (`Bench.streamingWordCountStore`) and the tuning harness
  * ([[StateStoreBench]]), so the number the bench records and the number
  * the tuning tool compares are the same code path by construction. */
object Drills {

  /** 4-trigger transformWithState word count over a MemoryStream fed
    * `reps` copies of `texts` per trigger; returns elapsed seconds. The
    * query is stopped (and its temp checkpoint abandoned) on EVERY path —
    * a leaked ProcessingTime(0) query would keep re-triggering and skew
    * every later measurement in the JVM. */
  /** Streaming LSH candidate generation under load: `docs` pumped through
    * `streamingLshCandidates` (minhash row maps + state-store band
    * buckets) in 4 micro-batches; returns (seconds, pairs emitted). Each
    * batch is id-offset AND word-salted (the ScaleDrill discipline) so
    * batches are disjoint near-dup universes: state grows across triggers
    * as an ingest stream's would, while per-batch pair volume stays the
    * corpus' own near-dup graph — the drill measures candidate
    * throughput, not a cross-batch duplication pathology. */
  def streamLshCandidates(spark: SparkSession, docs: Seq[(Long, String)],
                          batches: Int = 4): (Double, Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = java.nio.file.Files.createTempDirectory("lsh-stream-ck").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val pairs = graft.functions.Dedup.streamingLshCandidates(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      k = 3, numHashes = 4, rowsPerBand = 2, maxBucketSize = 64)
    val emitted = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = pairs.writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.addAndGet(b.queryExecution.toRdd.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()
    try {
      val t0 = System.nanoTime()
      (0 until batches).foreach { i =>
        input.addData(docs.map { case (id, t) =>
          (id + i * 10000000L,
            t.split(' ').iterator.map(w => s"${w}_b$i").mkString(" "))
        }: _*)
        q.processAllAvailable()
      }
      ((System.nanoTime() - t0) / 1e9, emitted.get())
    } finally {
      q.stop()
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(ck))
    }
  }

  def storeWordCount(spark: SparkSession, texts: Seq[String], reps: Int): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ck = java.nio.file.Files.createTempDirectory("wc-store-ck").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val counts = graft.streaming.StateStoreRunner.runningCount[String, String](
      input.toDS().flatMap(_.split(" ").iterator.filter(_.nonEmpty)), identity)
    val q = counts.writeStream.outputMode("update")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        b.queryExecution.toRdd.count(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      .start()
    try {
      val t0 = System.nanoTime()
      (0 until 4).foreach { _ =>
        input.addData(Seq.fill(reps)(texts).flatten: _*)
        q.processAllAvailable()
      }
      (System.nanoTime() - t0) / 1e9
    } finally {
      q.stop()
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(ck))
    }
  }
}
