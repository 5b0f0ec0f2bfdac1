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

  /** JSONL-drop field audit — the schema-coverage gate for semi-structured
    * ingest: per expected field, how many rows parse as JSON at all
    * (`n_valid`, via a whole-document `$` extraction — null iff the text
    * is not JSON) and how many of the VALID rows carry the field with a
    * non-null value (`n_present`, `present_ppm` of valid). A field whose
    * coverage collapses between drops is an upstream producer break —
    * the semi-structured cousin of [[check]] and the q193 stats-drift
    * contract. JSON `null` counts as ABSENT (in the training-data sense a
    * null field carries no information); an object/array value counts as
    * present (its text extracts non-null in both engines).
    *
    * Scale shape: every extraction folds into ONE conditional aggregate
    * over one scan (the [[check]] discipline — adding a field is free);
    * the per-field unpivot runs on the single wide row. */
  def jsonFieldAudit(df: DataFrame, jsonCol: String,
                     fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "at least one field required")
    fields.foreach(f => require(f.matches("[A-Za-z0-9_]+"),
      s"field name must be a plain identifier, got '$f'"))
    val valid = F.get_json_object(F.col(jsonCol), "$").isNotNull
    val aggs = F.count(F.lit(1)).as("__n") +:
      F.sum(F.when(valid, 1L).otherwise(0L)).as("__valid") +:
      fields.zipWithIndex.map { case (f, i) =>
        F.sum(F.when(valid &&
          F.get_json_object(F.col(jsonCol), s"$$.$f").isNotNull, 1L)
          .otherwise(0L)).as(s"__p_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = fields.zipWithIndex.map { case (f, i) =>
      s"'$f', __p_$i"
    }.mkString(", ")
    one.select(F.col("__n"), F.col("__valid"),
        F.expr(s"stack(${fields.size}, $stacked)").as(Seq("field", "n_present")))
      .select(F.col("field"), F.col("__n").as("n_rows"),
        F.col("__valid").as("n_valid"), F.col("n_present"),
        F.expr("""CAST(CAST(n_present AS DECIMAL(38,0)) * 1000000
                      DIV greatest(__valid, 1L) AS BIGINT)""").as("present_ppm"))
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
