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
    spark.stop()
  }
}
