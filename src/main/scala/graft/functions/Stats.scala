package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Distributed statistics with cross-engine-deterministic arithmetic.
  *
  * The discipline throughout: accumulate INTEGERS (exact, order-independent
  * under any shuffle), divide/sqrt as the LAST step (IEEE ops on identical
  * inputs give identical doubles on every engine). A naive
  * `stddev(double_col)` is not reproducible — float addition is
  * non-associative, so the result depends on partition order; at 100 TB
  * that means two runs of the same job disagree in the last ulps and any
  * exact downstream comparison (dedup keys, test sets, oracles) breaks.
  */
object Stats {

  /** Per-group mean and (population) standard deviation of an integer
    * column, plus each row's z-score — exact integer sums per group, one
    * shuffle. `intCol` must be integer-valued (e.g. cents) of any integer
    * width — it is widened to long before squaring, so the bound is on the
    * VALUES, not the column type: |x| ≤ ~3M keeps the summed squares inside
    * a long for billion-row groups. */
  private def withMoments(df: DataFrame, groupCol: String, intCol: String): DataFrame = {
    val byGroup = Window.partitionBy(groupCol)
    val xL = F.col(intCol).cast("long")
    df.withColumn("__n", F.count(F.lit(1)).over(byGroup))
      .withColumn("__s", F.sum(xL).over(byGroup))
      .withColumn("__ss", F.sum(xL * xL).over(byGroup))
      .withColumn("mean", F.col("__s").cast("double") / F.col("__n").cast("double"))
      .withColumn("variance",
        (F.col("__ss").cast("double") -
          F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n").cast("double")) /
          F.col("__n").cast("double"))
  }

  /** Rows more than `sigmas` standard deviations from their group's mean:
    * |x*n - s| > sigmas * sqrt(var) * n, rearranged to avoid dividing by a
    * zero stddev. Output keeps (group, id, value, mean, stddev). */
  def zscoreOutliers(df: DataFrame, groupCol: String, idCol: String,
      intCol: String, sigmas: Double): DataFrame =
    withMoments(df, groupCol, intCol)
      .withColumn("stddev", F.sqrt(F.col("variance")))
      .where(F.abs(F.col(intCol).cast("double") - F.col("mean")) >
        F.lit(sigmas) * F.col("stddev"))
      .select(F.col(groupCol), F.col(idCol), F.col(intCol), F.col("mean"),
        F.col("stddev"))

  /** Trailing moving average over the last `window` rows per key (ordered by
    * `ts`, tied by `tieBreak`): integer running sum / running count — exact,
    * then one final division. One shuffle on the key. */
  def movingAvg(df: DataFrame, keyCol: String, ts: String, tieBreak: String,
      intCol: String, window: Int, outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(F.col(ts), F.col(tieBreak))
      .rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn(outCol,
      F.sum(F.col(intCol)).over(w).cast("double") /
        F.count(F.lit(1)).over(w).cast("double"))
  }
}
