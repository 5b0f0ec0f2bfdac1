package graft.tools

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // full warm pass at sf0.001 like the bench
    try graft.SparkEntry.warmTables(spark, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    graft.SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    try graft.SparkEntry.warmTables(spark, dir) catch { case _: Throwable => () }
    for (name <- Seq("q52_multikey_join", "q62_tfidf", "q53_persistent_wordcount", "q61_percentile", "q02_each_function", "q103_retention")) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        println(f"[scratch] $name run$i build=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
