package graft.tools

import org.apache.spark.sql.SparkSession

/** Amortization drill, Spark side (VERDICT r15 #3): times a subset of
  * SparkEntry queries across several SF directories IN ONE WARM JVM and
  * prints one JSON line per (dir, query) with the median-of-3 seconds.
  * `tools/amortization_drill.py` orchestrates: builds the scaled dirs
  * (`tools/make_scaled_sf.py`), runs this, times the same queries'
  * DuckDB oracles per dir, and emits the ratio-vs-SF table for SCALE.md.
  *
  *   runMain graft.tools.Amortize q190_dependency_audit,q214_... \
  *     /root/testdata/sf0.1,/tmp/graft_sfx10,/tmp/graft_sfx100
  */
object Amortize {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bad = names.filterNot(graft.SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
    dirs.foreach { dir =>
      // one untimed warm pass per dir (file listing, codegen, page cache)
      names.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          System.err.println(s"[amortize] warm $n@$dir failed: ${e.getMessage}")
        }
      }
      names.foreach { n =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times(times.size / 2)
        println(f"""{"dir":"$dir","q":"$n","spark_sec":$med%.4f}""")
      }
    }
    spark.stop()
  }
}
