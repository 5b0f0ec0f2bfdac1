package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness for the state-store word-count drill (the
  * `stream_wordcount_store` bench entry): times the same 4-trigger
  * transformWithState/RocksDB run under different provider configs so
  * store-tier tuning is measured, not guessed.
  *
  * Usage: runMain graft.tools.StateStoreBench [reps] — compares RocksDB
  * with and without changelog checkpointing (appended changelog vs
  * full-snapshot upload per batch). The HDFS-backed default provider is
  * not comparable: transformWithState needs column families, which only
  * the RocksDB provider supports.
  *
  * Measured (sf0.1, local[32], 4 triggers x 2 corpus reps): snapshot
  * 4.8-5.1 s, changelog 5.6-8.6 s — changelog checkpointing does NOT pay
  * on a local filesystem (its win is avoiding per-batch full uploads to
  * OBJECT STORAGE; locally the snapshot write is a cheap rename and the
  * changelog is pure extra WAL work). Keep snapshot mode for single-node,
  * switch to changelog on a real cluster checkpointing to S3/HDFS.
  */
object StateStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect().toSeq
    val nWords = texts.iterator.map(_.split(" ").count(_.nonEmpty)).sum.toLong * 4 * reps

    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val configs = Seq(
      ("rocksdb+changelog", Map(
        "spark.sql.streaming.stateStore.providerClass" -> rocks,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")),
      ("rocksdb+snapshot", Map(
        "spark.sql.streaming.stateStore.providerClass" -> rocks,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "false")))

    configs.foreach { case (label, conf) =>
      // a transient failure in one config (including its warm run) must not
      // abort the others — the tool exists to produce the comparison
      try {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        // untimed warm run then 2 timed runs per config; Drills.storeWordCount
        // is the SAME code path the bench records
        val times = (0 until 3).map { i =>
          val t = Drills.storeWordCount(spark, texts, reps)
          if (i > 0) System.err.println(f"[ssbench] $label run$i: $t%.2fs = ${nWords / t}%.0f tuples/s")
          t
        }
        System.err.println(f"[ssbench] $label best: ${times.drop(1).min}%.2fs")
      } catch { case e: Throwable =>
        System.err.println(s"[ssbench] $label failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
