package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: times one SparkEntry query N times on a
  * warmed session and prints the formatted physical plan — the inner loop
  * for chasing a single slow bench entry. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    try graft.SparkEntry.warmTables(spark, sfDir)
    catch { case _: Throwable => () }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[qtime] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true"))
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
