package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a LIST of SparkEntry queries (median of N reps each) on one warmed
  * session — the A/B inner loop for the optimization round. Usage:
  * `sbt "runMain graft.tools.QTimeMany q60_dup_clusters q149_pagerank ..."`;
  * SPARK_GRAFT_QTIME_REPS overrides the rep count (default 3). Prints one
  * `[qtime] <name> med=<s> runs=[...]` line per query. */
object QTimeMany {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val reps = sys.env.getOrElse("SPARK_GRAFT_QTIME_REPS", "3").toInt.max(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    try graft.SparkEntry.warmTables(spark, sfDir)
    catch { case _: Throwable => () }
    // one untimed warm rep per query (codegen/statics), then timed reps
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[qtime] $name warm failed: ${e.getMessage}") }
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = runs.sorted.apply((runs.size - 1) / 2)
      println(f"[qtime] $name med=$med%.3f runs=${runs.map(r => f"$r%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
