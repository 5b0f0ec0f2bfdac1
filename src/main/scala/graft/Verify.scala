package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter for fast iteration on one query (the driver
    // never sets it): comma-separated names restrict BOTH the dumps and
    // the emitted oracle_sql.json so tools/oracle_check.py sees a
    // consistent pair.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // q51's unsorted-FirstN membership guard (r1-r7) retired: the judged
    // face is now deterministic (md5-hash-ordered limit) and carries a
    // full DuckDB oracle; the any-n API contract stays spec-covered in
    // StreamApiSpec.
    // q76 (HLL sketch) is engine-specific in its ESTIMATES but not
    // uncheckable either: the dump carries the exact distinct next to the
    // sketch, so every estimate must sit within the sketch's error bound
    // (HLL++ default rsd 0.05; 3σ → 15% relative). On violation the dump
    // is deleted so the gate fails loudly instead of passing rows-only.
    locally {
      import org.apache.spark.sql.functions.{abs, col, greatest, lit}
      val name = "q76_hll_distinct"
      try {
        val out = spark.read.parquet(s"$outDir/$name")
        val violations = out.where(
          abs(col("approx_users") - col("exact_users")) >
            greatest(lit(3.0), col("exact_users") * 0.15)).count()
        if (violations == 0L)
          System.err.println(s"[verify] $name estimate-bound: PASS " +
            s"(${out.count()} groups within 15% of exact)")
        else {
          System.err.println(s"[verify] $name estimate-bound: FAIL " +
            s"($violations groups outside 15%) — deleting dump")
          graft.util.Fs.deleteRecursively(Paths.get(s"$outDir/$name"))
        }
      } catch { case e: Throwable =>
        // same loud-failure rule as the membership guard: an erroring
        // check deletes the dump rather than quietly passing rows-only
        System.err.println(s"[verify] $name estimate-bound check errored " +
          s"(deleting dump): ${e.getMessage}")
        try graft.util.Fs.deleteRecursively(Paths.get(s"$outDir/$name"))
        catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
