package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.api._
import graft.drpc.LocalDRPC
import graft.sources.FeederSource
import graft.state._
import graft.streaming.StreamRunner

/** The canonical reference pipeline, end to end — the 1:1 port of
  * `storm-core/test/clj/storm/trident/integration_test.clj:55-86`
  * (FIXTURES.md §A1): feeder batches → split → groupBy(word) →
  * persistentAggregate(Count) → DRPC `words` query (split args → MapGet →
  * FilterNull → Sum), asserted against the reference's exact goldens
  * including the DRPC JSON wire format. */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden release pipeline: coarsen until the k-gate clears → audit trio green → DP release") {
    import spark.implicits._
    import graft.functions.Stats
    // a medical-records-shaped table: (age, zip, diagnosis). Raw (age,
    // zip) tuples are near-unique — the release loop must coarsen.
    val rows = (0 until 400).map { i =>
      val age = 20 + (i * 7919) % 45           // 20..64, scattered
      val zip = 10000 + (i * 104729) % 400     // near-unique at raw grain
      val diag = Seq("flu", "cold", "covid", "rsv")((i * 31) % 4)
      (age.toLong, zip.toLong, diag)
    }.toDF("age", "zip", "diagnosis")
    def kViolations(df: org.apache.spark.sql.DataFrame): Long =
      Stats.kAnonymityAudit(df, Seq("age_b", "zip_b"), k = 3)
        .where($"size_class" < 3).agg(F.coalesce(F.sum("n_rows"), F.lit(0L)))
        .head().getLong(0)
    // the coarsening ladder a release pass walks: finer -> coarser
    val ladder = Seq(
      ($"age".as("age_b"), $"zip".as("zip_b")),
      (($"age" - $"age" % 10).as("age_b"), ($"zip" - $"zip" % 100).as("zip_b")),
      (($"age" - $"age" % 20).as("age_b"), ($"zip" - $"zip" % 1000).as("zip_b")))
    val coarsened = ladder.map { case (a, z) => rows.select(a, z, $"diagnosis") }
    val chosen = coarsened.find(kViolations(_) == 0L)
    // the raw grain must NOT clear the gate (else the test is vacuous),
    // some rung must
    assert(kViolations(coarsened.head) > 0L)
    assert(chosen.isDefined)
    val rel = chosen.get
    // l-diversity: no homogeneity disclosures (class-1 groups) at l=2
    val lClasses = Stats.lDiversityAudit(rel, Seq("age_b", "zip_b"),
        "diagnosis", l = 2)
      .collect().map(r => r.getAs[Long]("diversity_class") -> r.getAs[Long]("n_groups")).toMap
    assert(!lClasses.contains(1L), s"homogeneous groups survived: $lClasses")
    // t-closeness: every group within 500000 ppm TV of the global mix
    val tBands = Stats.tClosenessAudit(rel, Seq("age_b", "zip_b"),
        "diagnosis", Seq(500000L)).collect()
      .map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_groups")).toMap
    assert(tBands.getOrElse(1L, 0L) == 0L, s"groups past the TV band: $tBands")
    // gates green -> publish DP noisy counts per quasi group; the
    // release never strays past the clamp from the true counts
    val truth = rel.groupBy("age_b", "zip_b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val released = Stats.dpNoisyCounts(rel, Seq("age_b", "zip_b"), seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("noisy_count")).toMap
    assert(released.keySet == truth.keySet)
    assert(released.forall { case (k, v) => math.abs(v - truth(k)) <= 32L })
    assert(released != truth) // noise actually applied somewhere
  }

  test("Topology facade: newStream → pipeline → newDRPCStream end to end") {
    import spark.implicits._
    val topology = new Topology(spark)
    val wc = topology
      .newStream("sentences",
        Seq("hello the man said", "the", "the man on the moon").toDF("sentence"))
      .flatEach(F.split(F.col("sentence"), " "), "word")
      .groupBy(Fields("word"))
      .aggregate(F.count(F.lit(1)).as("cnt"))
      .toDF
    val state = topology.newStaticState(wc, Fields("word"), Fields("cnt"))
    topology.newDRPCStream("words") { args =>
      args.flatEach(F.split(F.col("args"), " "), "word")
        .project(Fields("word"))
        .stateQuery(state, Fields("word"), Fields("cnt"))
        .filterNull(Fields("cnt"))
        .aggregate(F.sum("cnt").as("total"))
    }
    assert(topology.localDRPC.execute("words", "the man") == "[[6]]") // 4 + 2
  }

  test("multiple groupings of the same stream merge — integration_test.clj:166-186") {
    // the reference groups ONE drpc stream two independent ways, counts
    // each, and merges: every arg comes back twice with count 1
    import spark.implicits._
    val topology = new Topology(spark)
    topology.newDRPCStream("tester") { args =>
      val base = args.where(Operations.trueFilter)
      val s1 = base.groupBy(Fields("args"))
        .aggregate(F.count(F.lit(1)).cast("long").as("count"))
      val s2 = base.groupBy(Fields("args"))
        .aggregate(F.count(F.lit(1)).cast("long").as("count"))
      s1.merge(s2)
    }
    assert(topology.localDRPC.execute("tester", "the") == """[["the",1],["the",1]]""")
    assert(topology.localDRPC.execute("tester", "aaaaa") == """[["aaaaa",1],["aaaaa",1]]""")
  }

  test("word-count topology + DRPC goldens: [[2]], [[4]], [[8]]") {
    import spark.implicits._
    MemoryBackingMap.clear("golden-wc")
    val state = new OpaqueMap[Long](new MemoryBackingMap[OpaqueValue[Long]]("golden-wc"))
    val feeder = new FeederSource[String](spark)

    val words = new Stream(feeder.toDF.toDF("sentence"))
      .flatEach(F.split(F.col("sentence"), " "), "word")
      .project(Fields("word"))
    val q = StreamRunner.persistentAggregate[Long](words.toDF, Fields("word"),
      F.count(F.lit(1)).as("cnt"), _ + _, state, "golden-wc-query",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))

    val drpc = new LocalDRPC(spark)
    drpc.register("words", args => {
      val ts = new TridentState[Long](state, "golden-wc", Fields("word"), "cnt")
      val stateDf = ts.asStaticState(spark, StructType(Seq(
        StructField("word", StringType), StructField("cnt", LongType))))
      new Stream(args.split(" ").toSeq.toDF("word"))
        .stateQuery(stateDf, Fields("word"), Fields("cnt"))
        .filterNull(Fields("cnt"))
        .aggregate(F.sum("cnt").as("total"))
        .toDF
    })

    feeder.feed(Seq("hello the man said", "the"))
    q.processAllAvailable()
    assert(drpc.execute("words", "the") == "[[2]]")

    feeder.feed(Seq("the man on the moon", "where are you"))
    q.processAllAvailable()
    assert(drpc.execute("words", "the") == "[[4]]")
    assert(drpc.execute("words", "man where you the") == "[[8]]")
    q.stop()
  }

  test("golden: full training-data pipeline (sample→dedup→near-dup→quality→pack)") {
    import org.apache.spark.sql.{functions => F}
    import graft.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sampled = Sampling.bernoulliSample(docs, F.col("doc_id"), 900000L)
    val exact = Dedup.dropExactDups(sampled, "doc_id", "text")
    val near = Dedup.dropNearDups(exact, "doc_id", "text",
      k = 3, numHashes = 4, rowsPerBand = 2, threshold = 0.5)
    val clean = near.where(Text.qualityKeep(F.col("text")))
    val packed = Text.packSequences(clean, "lang", "doc_id", "text", 1024L)

    assert(docs.count() == 500)
    assert(sampled.count() == 447)   // deterministic 90% hash sample
    assert(exact.count() == 447)     // corpus has no exact dups in the sample
    assert(near.count() == 428)      // 19 near-dup cluster members dropped
    assert(clean.count() == 428)     // quality gate keeps all at this sf

    val summary = packed.groupBy("lang")
      .agg(F.count(F.lit(1)).as("n"), F.max("chunk_id").as("mx"),
        F.sum("n_tokens").as("tok"))
      .orderBy("lang")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(summary == Seq(
      ("de", 64L, 3L, 3712L),
      ("en", 162L, 8L, 8567L),
      ("es", 70L, 3L, 4038L),
      ("fr", 72L, 4L, 4304L),
      ("zh", 60L, 3L, 3161L)))
  }

  test("golden: round-6 curation pipeline (mask→cross-dedup→best-of-cluster→decontaminate→shard)") {
    import org.apache.spark.sql.{functions => F}
    import graft.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. strip corpus-wide duplicated 8-gram spans, keep cleaned text
    val masked = Dedup.maskDuplicatedSpans(docs, "doc_id", "text", n = 8, minCount = 2L)
      .join(docs.select("doc_id", "source", "lang"), Seq("doc_id"))
      .select(F.col("doc_id"), F.col("source"), F.col("lang"),
        F.col("clean_text").as("text"))
      .where(F.length(F.col("text")) > 0)

    // 2. drop new-batch docs overlapping the base corpus (src0 = base)
    val deduped = Dedup.crossCorpusDedup(
      masked.where(F.col("source") =!= "src0"),
      masked.where(F.col("source") === "src0"),
      "doc_id", "text", k = 8)

    // 3. near-dup clusters resolved to the LONGEST member
    val pairs = Dedup.nearDupPairs(
        deduped.where(Text.tokenCount(F.col("text")) >= 3),
        "doc_id", "text", k = 3, numHashes = 4, rowsPerBand = 2, threshold = 0.5)
      .select("a", "b")
    val clusters = Dedup.duplicateClusters(pairs, "a", "b")
    val best = Dedup.keepBestOfClusters(
      deduped.withColumn("n_chars", F.length(F.col("text")).cast("long")),
      "doc_id", clusters, "id", "cluster_id", "n_chars")

    // 4. decontaminate vs an eval slice, with the audit report alongside
    val eval = docs.where(F.col("doc_id") % 100 === 0)
    val survivors = Dedup.decontaminate(best, "doc_id", "text", eval, "text", 3)
    val report = Dedup.decontaminationReport(best, "doc_id", "text", eval, "text", 3)

    // 5. lay the survivors into 500-token shards per source
    val shards = Sampling.shardPlan(survivors, "doc_id", "text", "source", 500L)

    // masked: 24 fully-boilerplate docs reduce to empty and drop;
    // best == deduped: once the shared spans are REMOVED, no near-dup
    // clusters remain above threshold — masking upstream subsumes them
    val counts = (docs.count(), masked.count(), deduped.count(),
      best.count(), survivors.count(), report.count())
    assert(counts == ((500L, 476L, 455L, 455L, 293L, 162L)),
      s"pipeline stage counts drifted: $counts")
    assert(survivors.count() + report.count() == best.count())
    val nShards = shards.groupBy("source").agg(F.max("shard_id")).collect()
    assert(nShards.nonEmpty)
  }

  test("golden: round-7 curation tail (classifier gate→temperature mix→token-budget sample)") {
    import org.apache.spark.sql.{functions => F}
    import graft.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. model-based quality gate: hashed-linear classifier, keep >= mean
    val scored = Text.classifierScore(docs, "doc_id", "text")
    val kept = docs.join(scored.where(F.col("keep")).select("doc_id"), "doc_id")

    // 2. alpha=1/2 temperature weights over the kept corpus; the weights
    // frame is |sources| rows — collecting it to build the budget map is
    // the intended use (a driver-side model config, not a data read)
    val weights = Sampling.temperatureMixWeights(kept, "source", "text")
      .select("source", "weight_ppm").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // 3. materialize the mix: give each source weight_ppm's share of a
    // 5000-token training budget via the deterministic token-budget sampler
    val budget = 5000L
    val targets = weights.map { case (s, ppm) => s -> (budget * ppm / 1000000L) }
    val mixed = Sampling.tokenBudgetMix(kept, F.col("doc_id"), "text", "source",
      targets, defaultTarget = 0L)

    assert(scored.count() == 500 && kept.count() == 443)
    // flattening: every kept source gets a positive share of the budget
    assert(weights.size == 20 && weights.values.forall(_ > 0))
    assert(weights.values.sum <= 1000000L)
    val gotTokens = mixed.groupBy("source")
      .agg(F.sum(Text.tokenCount(F.col("text")).cast("long")).as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic end-to-end: same corpus -> same mixed sample, and the
    // realized token mass lands under (near) the 5000-token budget
    assert(mixed.count() == 68, s"mixed count drifted: ${mixed.count()}")
    assert(gotTokens.values.sum == 4090L, s"token mass drifted: $gotTokens")
  }

  test("golden: evaluation tail (eval the gate → agreement → LSH/ANN audits)") {
    import org.apache.spark.sql.{functions => F}
    import graft.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. evaluate the hashed classifier against the lang=en label: its
    // weights are content-hash noise w.r.t. language, so AUC pins near
    // chance — exactly the verdict that tells a pipeline owner NOT to
    // ship this gate for language filtering
    val scored = Text.classifierScore(docs, "doc_id", "text")
    val labeled = scored.join(docs.select(F.col("doc_id"),
      (F.col("lang") === "en").as("label")), "doc_id")
    val ev = Eval.binaryEval(labeled, "score_milli", "label", 1000000L).head()
    assert(ev.getAs[Long]("n") == 500L && ev.getAs[Long]("npos") == 193L)
    assert(ev.getAs[Long]("auc_ppm") == 480143L)    // ~chance
    assert(ev.getAs[Long]("recall_ppm") == 860103L) // keeps most of everything
    assert(ev.getAs[Long]("f1_ppm") == 522011L)

    // 2. agreement between the gate and the label is BELOW chance —
    // kappa's exact fraction goes negative, the case the ppm-division
    // encoding can't represent portably
    val kap = Eval.cohenKappa(
      labeled.withColumn("is_en", F.col("label")), "keep", "is_en").head()
    assert(kap.getAs[Long]("kappa_num") == -4998L)
    assert(kap.getAs[Long]("kappa_den") == 147002L)

    // 3. the dedup-parameter audits over the same corpus: banded LSH
    // catches all 3 true near-dup pairs in the 1/2 sample (4 candidates),
    // IVF at nProbe=2 of 7 cells recalls 30-70% per query — measured
    // numbers a 100 TB run would be tuned against
    val lsh = Dedup.lshRecallAudit(docs, "doc_id", "text",
      k = 3, numHashes = 4, rowsPerBand = 2, threshold = 0.05,
      sampleMod = 2L).head()
    assert(lsh.getAs[Long]("truth_pairs") == 3L)
    assert(lsh.getAs[Long]("recall_ppm") == 1000000L)
    assert(lsh.getAs[Long]("candidate_precision_ppm") == 750000L)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.where(F.col("vec_id") % 100 =!= 0)
    val ann = Similarity.annRecallAudit(corpus, "embedding", "vec_id",
        emb.where(F.col("vec_id") % 100 === 0), "vec_id", "embedding",
        corpus.where(F.col("vec_id") < 8), "vec_id", "embedding",
        k = 10, nProbe = 2)
      .orderBy("qid")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(ann == Seq((0L, 700000L), (100L, 300000L), (200L, 400000L),
      (300L, 400000L), (400L, 400000L)), s"ANN recall drifted: $ann")
  }

  test("golden: one-pass layout pipeline (shard sketches → merge → plan) equals the corpus-pass planner") {
    import spark.implicits._
    import graft.functions.Scale
    // skewed synthetic corpus: unique ids, values quadratically bunched
    val df = spark.range(1, 20001)
      .select(F.col("id"), ((F.col("id") * F.col("id")) % 99991L).as("key"))
    // the 100 TB path: per-shard bottom-k sketches (8 "ingest shards"),
    // merged losslessly, boundaries planned WITHOUT a corpus audit pass
    val merged = Scale.quantileSketchSharded(
      df.select(F.lit("g").as("g"), F.col("id"), F.col("key")),
      "g", "id", "key", F.col("id") % 8, k = 256)
    val fromSketch = Scale.rangePlanFromSketch(merged, buckets = 8)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Long]("lo")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("hi")).map(_.toLong)))
    // the corpus-pass planner (q186) over the same data, same k — the
    // bottom-k sample is a pure function of md5(id), so the one-pass
    // sketch path must pick THE SAME boundaries
    val full = Scale.rangePartitionPlan(df, "key", "id", buckets = 8, k = 256)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Long]("lo")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("hi")).map(_.toLong),
        r.getAs[Long]("cnt")))
    assert(fromSketch.toSeq == full.map(t => (t._1, t._2, t._3)).toSeq,
      s"sketch-planned boundaries diverged from the corpus-pass planner:\n" +
        s"sketch: ${fromSketch.toSeq}\nfull:   ${full.toSeq}")
    // and the layout is genuinely equi-depth-ish: every bucket within
    // 3x of the ideal share (sampling error at k=256), none empty
    val counts = full.map(_._4)
    val ideal = counts.sum / 8
    assert(counts.forall(c => c > 0 && c < ideal * 3),
      s"bucket balance off: ${counts.toSeq} vs ideal $ideal")
  }
}
