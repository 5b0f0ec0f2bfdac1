package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Declarative data-quality expectations: evaluate named row-level
  * predicates in ONE pass over the data and report per-check violation
  * counts — the pre-ingestion gate a training pipeline runs before
  * accepting a new data drop. All checks fold into a single aggregate
  * projection (no per-check scan, no shuffle beyond the one global
  * aggregation), so adding a check is free at 100 TB.
  */
object Expectations {

  /** One row: (check, n_rows, n_violations, violation_ppm). */
  def check(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    // positional aliases, with the user's (arbitrary) check names carried
    // only as SQL string literals: a name with spaces/quotes/hyphens must
    // not break identifier parsing
    val aggs = F.count(F.lit(1)).as("__n") +: checks.zipWithIndex.map {
      case ((_, cond), i) => F.sum(F.when(cond, 0L).otherwise(1L)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (check, counts) rows
    def sqlLit(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stacked = checks.zipWithIndex.map { case ((name, _), i) =>
      s"${sqlLit(name)}, __v_$i"
    }.mkString(", ")
    one.select(F.col("__n"),
        F.expr(s"stack(${checks.size}, $stacked)").as(Seq("check", "n_violations")))
      .select(F.col("check"), F.col("__n").as("n_rows"),
        F.col("n_violations"),
        // integer DIV — `/` on longs is double division in both engines
        F.expr("n_violations * 1000000 DIV __n").as("violation_ppm"))
  }

  /** Gate: throw if any check exceeds its tolerance (ppm). */
  def enforce(df: DataFrame, checks: Seq[(String, Column)],
              maxViolationPpm: Long = 0L): Unit = {
    val bad = check(df, checks)
      .where(F.col("violation_ppm") > maxViolationPpm)
      .collect()
    require(bad.isEmpty,
      "expectation(s) failed: " + bad.map(r =>
        s"${r.getString(0)}=${r.getLong(2)} rows").mkString(", "))
  }
}
