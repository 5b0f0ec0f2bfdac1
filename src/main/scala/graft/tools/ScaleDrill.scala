package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.functions.{Dedup, Sampling, Text}

/** Measured scale curve for the dedup/LSH pipelines (SCALE.md's recipe):
  * replicate the sf0.1 documents table N× and time the q36/q60/q74/q85
  * pipeline shapes at each size — ~linear growth is the expected shape; a
  * superlinear jump means a hidden all-pairs or driver bottleneck.
  *
  * Replication detail that makes the curve MEANINGFUL: each replica's words
  * are salted with the replica index (`w -> w_rN`), so replicas are NOT
  * near-duplicates of each other — every replica universe reproduces the
  * original corpus' near-dup graph disjointly, and candidate-pair volume
  * grows exactly linearly by construction. Naive replication would make
  * each document a near-dup of its N copies: LSH buckets would inflate
  * quadratically in N and the drill would measure that data pathology, not
  * the engine. Replica 0 is salted too, so the 1× point has the same
  * per-word shape as every other size.
  *
  * Usage:
  *   runMain graft.tools.ScaleDrill pipelines 1,10   # time pipelines
  *   runMain graft.tools.ScaleDrill bpe              # batched-BPE drill
  */
object ScaleDrill {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("pipelines")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "bpe" => bpeDrill(spark, sfDir,
        numMerges = args.lift(1).map(_.toInt).getOrElse(120))
      case _ => pipelineDrill(spark, sfDir,
        args.lift(1).getOrElse("1,10").split(",").map(_.trim.toInt).toSeq,
        nameFilter = args.lift(2))
    }
    spark.stop()
  }

  /** Word-salted N× replication of the documents table (see object doc). */
  def replicate(docs: DataFrame, reps: Int): DataFrame =
    docs.crossJoin(F.broadcast(
        docs.sparkSession.range(reps).select(F.col("id").as("__rep"))))
      .select(
        (F.col("doc_id") + F.col("__rep") * 10000000L).as("doc_id"),
        F.array_join(F.transform(F.split(F.col("text"), " "),
          w => F.concat(w, F.lit("_r"), F.col("__rep").cast("string"))), " ")
          .as("text"),
        F.col("lang"), F.col("source"))

  private def pairs(docs: DataFrame): DataFrame =
    Dedup.nearDupPairs(docs.where(Text.tokenCount(F.col("text")) >= 3),
        "doc_id", "text", k = 3, numHashes = 4, rowsPerBand = 2, threshold = 0.05)
      .select("a", "b")

  /** The four pipeline shapes of the recorded bench (sans final sorts —
    * the drill times pipeline work, not output ordering). */
  def drills: Seq[(String, DataFrame => DataFrame)] = Seq(
    "minhash_sig (q36)" -> (docs =>
      Dedup.minhashSignature(docs.where(Text.tokenCount(F.col("text")) >= 3),
        "text", 3, 2).select("doc_id", "mh0", "mh1")),
    "dup_clusters (q60)" -> (docs =>
      Dedup.duplicateClusters(pairs(docs), "a", "b")),
    "neardup_pipeline (q74)" -> { docs =>
      val drops = Dedup.duplicateClusters(pairs(docs), "a", "b")
        .where(F.col("id") =!= F.col("cluster_id"))
        .select(F.col("id").as("doc_id"))
      docs.join(drops, Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.sum(Text.tokenCount(F.col("text")).cast("long")).as("n_tokens"))
    },
    "leakfree_split (q85)" -> { docs =>
      val clusters = Dedup.duplicateClusters(pairs(docs), "a", "b")
      Sampling.leakFreeSplit(docs, "doc_id", clusters, "id", "cluster_id",
          testPpm = 200000L)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).as("n_docs"))
    },
    "winnow_overlap (q111)" -> (docs =>
      Dedup.winnowOverlapCandidates(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2L, maxBucketSize = 12)),
    "dsir_weights (q112)" -> (docs =>
      Sampling.dsirWeights(docs, docs.where(F.col("lang") === "en"),
        "doc_id", "text")),
    "containment (q118)" -> (docs =>
      Dedup.containmentPairs(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2L, maxBucketSize = 12,
        minContainmentPpm = 300000L)),
    // word-salted replicas keep each replica's dup-gram population
    // disjoint: dup windows (and masked volume) scale linearly with N
    // summing length(clean_text) keeps the reassembly in the measured
    // plan (a bare n_masked sum would let Catalyst prune the rebuild out)
    "dup_span_mask (q125)" -> (docs =>
      Dedup.maskDuplicatedSpans(docs, "doc_id", "text", n = 8, minCount = 2L)
        .groupBy().agg(F.sum("n_masked").as("total_masked"),
          F.sum(F.length(F.col("clean_text")).cast("long")).as("total_clean_chars"))),
    // word-salting grows the vocabulary linearly with N: this row measures
    // the vocabulary-keyed join family (count-table builds + probes) as
    // both corpus AND key cardinality scale
    "trigram_lm (q129)" -> (docs =>
      graft.functions.Text.trigramLmScore(docs, "doc_id", "text")
        .groupBy().agg(F.sum("lm3_sum_ppm").as("total_ppm"),
          F.sum("n_trigrams").as("total_trigrams"))))

  def pipelineDrill(spark: SparkSession, sfDir: String, sizes: Seq[Int],
                    nameFilter: Option[String] = None): Unit = {
    val picked = nameFilter match {
      case Some(f) => drills.filter(_._1.contains(f))
      case None => drills
    }
    require(picked.nonEmpty, s"no drill matches $nameFilter")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val dirs = sizes.map { r =>
      val dir = s"/tmp/graft_scale_docs_x$r"
      // trust a cached corpus only if its write completed (_SUCCESS):
      // a partial dir from a killed prior run would silently time a
      // fraction of the intended corpus and record a bogus curve
      val path = java.nio.file.Paths.get(dir)
      val complete = java.nio.file.Files.isRegularFile(path.resolve("_SUCCESS"))
      if (java.nio.file.Files.isDirectory(path) && !complete) {
        System.err.println(s"[scale] discarding partial corpus at $dir")
        graft.util.Fs.deleteRecursively(path)
      }
      if (!complete) {
        replicate(base, r).write.parquet(dir)
        System.err.println(s"[scale] wrote x$r corpus to $dir")
      }
      r -> dir
    }
    // warm pass on the smallest size (codegen/statics, same discipline as Bench)
    val warm = spark.read.parquet(dirs.head._2)
    picked.foreach { case (_, fn) =>
      try fn(warm).queryExecution.toRdd.count() catch { case _: Throwable => () }
    }
    println(f"| pipeline | " + sizes.map(r => f"x$r sec").mkString(" | ") + " | ratios |")
    val results = picked.map { case (name, fn) =>
      val times = dirs.map { case (_, dir) =>
        val docs = spark.read.parquet(dir)
        // best of 2 reps — same transient discipline as the recorded bench
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(docs).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val ratios = times.tail.zip(times).map { case (b, a) => f"${b / a}%.1fx" }
      println(f"| $name | " + times.map(t => f"$t%.2f").mkString(" | ") +
        " | " + ratios.mkString(", ") + " |")
      name -> times
    }
    // rows at each size, for the record
    dirs.foreach { case (r, dir) =>
      System.err.println(s"[scale] x$r rows=" + spark.read.parquet(dir).count())
    }
    results.foreach { case (name, times) =>
      System.err.println(s"[scale] $name: " + times.map(t => f"$t%.3f").mkString(", "))
    }
  }

  /** Batched-BPE throughput: sequential vs maxMergesPerRound=8 on the real
    * corpus — wall time, rounds, merges/round, and a merge-table parity
    * check (the batched mode must reproduce sequential order exactly). */
  def bpeDrill(spark: SparkSession, sfDir: String, numMerges: Int): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm: a short train fills codegen/statics
    graft.functions.Bpe.train(docs, "text", numMerges = 3).collect()
    val runs = Seq(1, 8).map { m =>
      val rounds = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val merges = graft.functions.Bpe.train(docs, "text", numMerges = numMerges,
        maxMergesPerRound = m, roundCounter = rounds).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"| maxMergesPerRound=$m | ${merges.length} merges | ${rounds.get()} rounds | " +
        f"${merges.length.toDouble / rounds.get()}%.2f merges/round | $sec%.1f s |")
      merges.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    println(if (runs(0) == runs(1)) "parity: PASS (batched == sequential merge table)"
      else "parity: FAIL")
  }
}
