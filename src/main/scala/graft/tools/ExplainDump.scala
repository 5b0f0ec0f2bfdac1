package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output (plus the AQE final executed plan)
  * for the named SparkEntry queries to `$SPARK_GRAFT_PLANS_DIR/<name>_<suffix>.txt` (default plans/r17) —
  * the optimization round's before/after plan evidence. Usage:
  * `sbt "runMain graft.tools.ExplainDump before q60_dup_clusters ..."`.
  * With no query names, dumps every query in SparkEntry. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
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
    val outDir = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r17"))
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // execute so the AQE FINAL plan (real join choices, coalesced
        // exchanges) is available next to the static formatted plan
        try df.queryExecution.toRdd.count() catch { case _: Throwable => () }
        val finalPlan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val text = s"== explain(formatted), $q @ $sfDir ==\n" + formatted +
          "\n== AQE final executed plan ==\n" + finalPlan
        java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[explain] wrote $q ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
