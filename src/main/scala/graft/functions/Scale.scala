package graft.functions

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Scale utilities: skew-safe aggregation and co-located (bucketed) joins —
  * the partitioning discipline a 100 TB deployment needs around the core
  * operators (SURVEY.md §7.2 step 9).
  */
object Scale {

  /** Two-phase salted aggregation for skewed keys: phase 1 aggregates
    * (key, salt) — spreading a hot key over `saltBuckets` reducers — phase 2
    * combines the per-salt partials. Correct for any commutative/associative
    * Column aggregate pair (`partial` on rows, `merge` on partials).
    *
    * {{{
    *   // skew-safe count by user:
    *   saltedAggregate(events, Seq("user_id"), 16,
    *     F.count(F.lit(1)).as("cnt"), F.sum("cnt").as("cnt"))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partial: Column, merge: Column): DataFrame = {
    // DETERMINISTIC salt (hash of full row content): partition-id or
    // monotonic-id salts change when a task recomputes after a fetch
    // failure, double-counting rows across (key, salt) groups — the same
    // retry hazard the sampling module bans rand() for. Identical rows
    // share a bucket (they hash alike); that only matters for skew made of
    // EXACT duplicate rows, which exact-dedup upstream removes anyway.
    val salted = df.withColumn("__salt",
      F.pmod(F.xxhash64(df.columns.map(F.col).toSeq: _*), F.lit(saltBuckets.toLong)))
    salted
      .groupBy((keys :+ "__salt").map(F.col): _*)
      .agg(partial)
      .groupBy(keys.map(F.col): _*)
      .agg(merge)
  }

  /** AQE skew-join settings — runtime splitting of oversized partitions;
    * the first line of defense before manual salting. */
  def enableAdaptiveSkewHandling(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  /** Write a table bucketed+sorted by the join key: two tables bucketed the
    * same way join with NO exchange (asserted in `ScaleSpec`) — the
    * co-located join the reference achieves with fixed state partitioning
    * (`TridentTopology` parallelism pinning, SURVEY.md §4). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write a table partitioned by a low-cardinality column (lang, IVF cell,
    * date): queries filtering on it scan ONLY the matching directories
    * (partition pruning — asserted in `ScaleSpec`). The write repartitions
    * by the partition column first so each output task produces one file
    * per directory instead of `tasks × partitions` small files — the
    * 100 TB small-files discipline. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(F.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Salting for skewed JOINS: replicate the small side `saltBuckets` times,
    * salt the big side's key randomly-but-deterministically, join on
    * (key, salt). Bounded memory per task regardless of key skew. */
  /** Z-order (Morton) clustered layout: range-partition + sort by the
    * interleaved code of two dimensions, so each output file covers a small
    * bounding box in BOTH — min/max file stats then prune 2-D predicates
    * (a single-column sort only prunes its own column). Write the result
    * with `writePartitioned`/parquet; inputs are used mod 2^32. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
               numPartitions: Int): DataFrame = {
    val z = graft.plans.Expressions.zorder(F.col(xCol), F.col(yCol))
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, F.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltBuckets: Int): DataFrame = {
    // deterministic content-hash salt — see saltedAggregate for why ids
    // and partition-ids are retry-unsafe here
    val saltedBig = big.withColumn("__salt",
      F.pmod(F.xxhash64(big.columns.map(F.col).toSeq: _*), F.lit(saltBuckets.toLong)))
    val explodedSmall = small.withColumn("__salt",
      F.explode(F.sequence(F.lit(0L), F.lit(saltBuckets.toLong - 1))))
    saltedBig.join(explodedSmall,
      saltedBig(bigKey) === explodedSmall(smallKey) &&
        saltedBig("__salt") === explodedSmall("__salt"))
      .drop("__salt")
  }
}
