package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** One-off probe for the optimization round: what does the FINAL
  * deterministic-output orderBy cost on a typical tail query? Times the
  * q11-shaped aggregate with and without its trailing sort. */
object SortCostProbe {
  def main(args: Array[String]): Unit = {
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
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def agg() = ev.groupBy("event_type")
      .agg(F.count(F.lit(1)).as("cnt"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
    def time(label: String, reps: Int)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().queryExecution.toRdd.count() // warm
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label med=${runs.sorted.apply((reps - 1) / 2)}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    time("agg_plain", 7)(() => agg())
    time("agg_orderBy", 7)(() => agg().orderBy("event_type"))
    // and a wider result (per-user) to see sort cost vs result size
    def agg2() = ev.groupBy("user_id").agg(F.count(F.lit(1)).as("cnt"))
    time("wide_plain", 7)(() => agg2())
    time("wide_orderBy", 7)(() => agg2().orderBy("user_id"))
    spark.stop()
  }
}
