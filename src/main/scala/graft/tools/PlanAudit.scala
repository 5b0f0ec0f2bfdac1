package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the executed physical plan (and a
  * join/exchange summary) for the named SparkEntry queries — or a summary
  * line for every query with no args. Usage:
  * `sbt "runMain graft.tools.PlanAudit [queryName ...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      // execute first: under AQE the pre-execution plan is a bare
      // AdaptiveSparkPlan skeleton — codegen spans and final join choices
      // only exist in the post-execution final plan
      val qe = graft.SparkEntry.queries(q)(spark, dir).queryExecution
      try qe.toRdd.count() catch { case _: Throwable => () }
      // under AQE the plan string carries BOTH the final and the initial
      // plan; audit only the final one so operator counts aren't doubled
      val full = qe.executedPlan.toString
      val plan = full.split("== Initial Plan ==")(0)
    val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Cartesian") || l.contains("Generate"))
        .map(_.trim.replaceAll("\\[plan_id=\\d+\\]", "").take(120)).toSeq
      println(s"== $q ==")
      if (args.nonEmpty) println(plan)
      else {
        joins.foreach(l => println(s"  $l"))
        // strip tree-drawing prefixes (+-, :-, spaces) before matching
        def ops(name: String): Int = plan.linesIterator
          .count(_.dropWhile(c => !c.isLetter).startsWith(name))
        // codegen'd operators carry a `*(stageId)` prefix in the simple
        // plan string; count distinct stage ids = codegen spans
        val codegenSpans = "\\*\\((\\d+)\\)".r
          .findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(s"  exchanges=${ops("Exchange")} codegenSpans=$codegenSpans")
      }
    }
    spark.stop()
  }
}
