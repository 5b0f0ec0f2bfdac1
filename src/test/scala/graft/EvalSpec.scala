package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Eval}

/** Evaluation-operator tests: hand-computed AUC/confusion, kappa sign
  * behavior, RRF fusion with one-sided rankings, retrieval metrics, and
  * the LSH recall audit's internal consistency. */
class EvalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("binaryEval: midrank-tied AUC and confusion rates, hand-checked") {
    // pairs credit: pos5/neg5 tie .5, pos5/neg10 0, pos10/neg5 1,
    // pos10/neg10 .5, pos20 vs both 1+1  => 4 of 6 => AUC 2/3
    val df = Seq((5L, true), (5L, false), (10L, true), (10L, false),
      (20L, true)).toDF("score", "label")
    val r = Eval.binaryEval(df, "score", "label", 10L).head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("npos") == 3L)
    assert(r.getAs[Long]("nneg") == 2L)
    assert(r.getAs[Long]("auc_x2_num") == 8L)
    assert(r.getAs[Long]("auc_ppm") == 666666L)   // 8e6 DIV 12
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Long]("precision_ppm") == 666666L)
    assert(r.getAs[Long]("recall_ppm") == 666666L)
    assert(r.getAs[Long]("f1_ppm") == 666666L)
  }

  test("binaryEval: degenerate inputs yield NULL rates, not div-by-zero") {
    // all-positive: nneg=0 so AUC undefined; nothing kept: precision/f1 null
    val allPos = Seq((1L, true), (2L, true)).toDF("score", "label")
    val r1 = Eval.binaryEval(allPos, "score", "label", 100L).head()
    assert(r1.isNullAt(r1.fieldIndex("auc_ppm")))
    assert(r1.isNullAt(r1.fieldIndex("precision_ppm")))
    assert(r1.isNullAt(r1.fieldIndex("f1_ppm")))
    assert(r1.getAs[Long]("recall_ppm") == 0L) // npos>0, tp=0
    val mixed = Seq((1L, true), (2L, false)).toDF("score", "label")
    val r2 = Eval.binaryEval(mixed, "score", "label", 100L).head()
    assert(r2.getAs[Long]("auc_ppm") == 0L) // defined: the one pair is wrong-ordered...
  }

  test("binaryEval: perfect separation scores 1e6 ppm") {
    val df = Seq((1L, false), (2L, false), (9L, true), (8L, true))
      .toDF("score", "label")
    val r = Eval.binaryEval(df, "score", "label", 8L).head()
    assert(r.getAs[Long]("auc_ppm") == 1000000L)
    assert(r.getAs[Long]("precision_ppm") == 1000000L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("f1_ppm") == 1000000L)
  }

  test("binaryEval: histogram-fold AUC equals brute-force pair counting on random fixtures") {
    // the histogram identity auc_x2 = Σ pos_s·(2·cumneg_<s + neg_s) vs the
    // definitional 2·wins + ties over all (pos, neg) pairs — 12 seeded
    // random fixtures with heavy score ties to stress the midrank path
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val n = 5 + rnd.nextInt(40)
      val rows = Seq.fill(n)((rnd.nextInt(6).toLong, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val aucX2 = (for { p <- pos; q <- neg } yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      val r = Eval.binaryEval(rows.toDF("score", "label"),
        "score", "label", 3L).head()
      assert(r.getAs[Long]("auc_x2_num") == aucX2,
        s"trial $trial: fold ${r.getAs[Long]("auc_x2_num")} != brute $aucX2 ($rows)")
      assert(r.getAs[Long]("tp") == rows.count(x => x._1 >= 3L && x._2))
      assert(r.getAs[Long]("tn") == rows.count(x => x._1 < 3L && !x._2))
    }
  }

  test("squeezeRepeatTokens: collapses runs, keeps non-consecutive repeats") {
    import graft.functions.Text
    val df = Seq((1L, "a a b a c c c"), (2L, "x y z"), (3L, ""))
      .toDF("id", "text")
    val out = Text.squeezeRepeatTokens(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((7L, 4L, "a b a c"))) // runs squeezed, 'a' at pos 4 kept
    assert(out(2L) == ((3L, 3L, "x y z")))   // untouched
    assert(out(3L) == ((0L, 0L, "")))        // empty stays empty

    // native single-pass expression == the executable higher-order
    // spelling (which is the spec, but ~15x slower — see SqueezeRuns doc)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = Text.squeezeRepeatTokens(docs, "doc_id", "text")
    val columnTier = docs
      .select(F.col("doc_id"), F.expr(
        "filter(filter(split(text, ' '), x -> x != ''), (x, i) -> i = 0 OR x != element_at(filter(split(text, ' '), x -> x != ''), i))")
        .as("__keep"))
      .select(F.col("doc_id"), F.array_join(F.col("__keep"), " ").as("clean_text"))
    assert(native.select("doc_id", "clean_text").except(columnTier).count() == 0)
    assert(columnTier.except(native.select("doc_id", "clean_text")).count() == 0)
  }

  test("calibrationBins: exact per-bin positive rates and floor means") {
    val df = Seq((50L, true), (60L, false), (250L, true), (260L, true),
      (270L, false)).toDF("score", "label")
    val out = Eval.calibrationBins(df, "score", "label", 100L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 1L, 500000L, 55L),
      (2L, 200L, 3L, 2L, 666666L, 260L)))

    // signed scores (logits) bin by FLOOR: -150 belongs to bin -2
    // [-200,-100), not a double-width bin 0 — and bin_lo stays a bound
    val signed = Seq((-150L, true), (-99L, false), (99L, true))
      .toDF("score", "label")
    val sb = Eval.calibrationBins(signed, "score", "label", 100L)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sb.toSeq == Seq((-2L, -200L), (-1L, -100L), (0L, 0L)))
  }

  test("eval operators exclude NULL scores/labels by rule, keeping counts consistent") {
    val df = Seq[(java.lang.Long, java.lang.Boolean)](
      (10L, true), (5L, false), (null, true), (7L, null))
      .toDF("score", "label")
    val r = Eval.binaryEval(df, "score", "label", 8L).head()
    assert(r.getAs[Long]("n") == 2L) // null-score + null-label rows dropped
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn") == r.getAs[Long]("n"))
    val k = Eval.cohenKappa(Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, true), (null, false), (false, null), (false, false))
      .toDF("a", "b"), "a", "b").head()
    assert(k.getAs[Long]("n") == 2L && k.getAs[Long]("agree") == 2L)
  }

  test("binaryEvalByGroup: each group row equals binaryEval on that slice alone") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(60)((Seq("a", "b", "c")(rnd.nextInt(3)),
      rnd.nextInt(8).toLong, rnd.nextBoolean()))
    val df = rows.toDF("grp", "score", "label")
    val grouped = Eval.binaryEvalByGroup(df, "grp", "score", "label", 4L)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = Eval.binaryEval(df.where($"grp" === g), "score", "label", 4L).head()
      for (c <- Seq("n", "npos", "nneg", "auc_x2_num", "tp", "fp", "fn", "tn"))
        assert(grouped(g).getAs[Long](c) == solo.getAs[Long](c),
          s"group $g column $c diverged from the solo face")
      assert(grouped(g).getAs[Any]("auc_ppm") == solo.getAs[Any]("auc_ppm"))
      assert(grouped(g).getAs[Any]("f1_ppm") == solo.getAs[Any]("f1_ppm"))
    }
  }

  test("cohenKappa: perfect, independent, and below-chance agreement") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    val p = Eval.cohenKappa(perfect, "a", "b").head()
    assert(p.getAs[Long]("kappa_num") == p.getAs[Long]("kappa_den"))
    assert(p.getAs[Long]("po_ppm") == 1000000L)

    // total disagreement with balanced marginals => kappa = -1 (num = -den):
    // the reason kappa ships as an exact fraction, not a divided ppm
    val inverted = Seq((true, false), (true, false), (false, true),
      (false, true)).toDF("a", "b")
    val i = Eval.cohenKappa(inverted, "a", "b").head()
    assert(i.getAs[Long]("agree") == 0L)
    assert(i.getAs[Long]("kappa_num") == -i.getAs[Long]("kappa_den"))
    assert(i.getAs[Long]("kappa_num") < 0L)
  }

  test("rrfFuse: fused ranks, deterministic ties, one-sided ids get 0") {
    // group g: ids 1,2 in both rankings; id 3 only in A; id 4 only in B
    val a = Seq(("g", 1L, 100L), ("g", 2L, 50L), ("g", 3L, 10L))
      .toDF("grp", "id", "score")
    val b = Seq(("g", 2L, 90L), ("g", 1L, 80L), ("g", 4L, 70L))
      .toDF("grp", "id", "score")
    val out = Eval.rrfFuse(a, b, "grp", "id", "score", k = 4, rrfK = 60L)
      .orderBy("fused_rank")
      .select("id", "rank_a", "rank_b", "fused", "fused_rank")
      .collect()
    // id1: rank_a 1, rank_b 2 -> 1e9/61 + 1e9/62 = 16393442 + 16129032
    // id2: rank_a 2, rank_b 1 -> same sum (tie) -> id asc breaks it
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(3) == 1000000000L / 61 + 1000000000L / 62)
    assert(byId(1L).getLong(4) == 1L) // tie with id2, id1 wins by id asc
    assert(byId(2L).getLong(4) == 2L)
    // one-sided: id3 rank_a=3 only -> 1e9/63; id4 rank_b=3 only -> 1e9/63
    assert(byId(3L).isNullAt(2) && byId(3L).getLong(3) == 1000000000L / 63)
    assert(byId(4L).isNullAt(1) && byId(4L).getLong(3) == 1000000000L / 63)
    assert(byId(3L).getLong(4) == 3L && byId(4L).getLong(4) == 4L)
  }

  test("retrievalMetrics: first-relevant rank, rr, precision@k numerator") {
    val df = Seq(
      ("q1", 1L, 90L, false), ("q1", 2L, 80L, true), ("q1", 3L, 70L, true),
      ("q2", 4L, 60L, false), ("q2", 5L, 50L, false)).toDF(
      "grp", "id", "score", "rel")
    val out = Eval.retrievalMetrics(df, "grp", "id", "score", "rel", k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val q1 = out("q1")
    assert(q1.getAs[Long]("first_rel_rank") == 2L)
    assert(q1.getAs[Long]("rr_e9") == 500000000L)
    assert(q1.getAs[Long]("rel_at_k") == 1L) // only rank-2 hit inside top 2
    assert(q1.getAs[Long]("n_candidates") == 3L)
    val q2 = out("q2")
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.getAs[Long]("rr_e9") == 0L)
    assert(q2.getAs[Long]("rel_at_k") == 0L)
  }

  test("lshRecallAudit: identical-pair corpus scores exact full recall") {
    // 20 identical-text pairs with pair-disjoint vocabularies (cross-pair
    // jaccard 0) + unrelated filler; sampleMod=1 keeps every doc, so truth
    // is EXACTLY the 20 pairs and identical signatures share every band
    val docs = (0 until 20).flatMap { i =>
      val t = s"a$i b$i c$i d$i e$i f$i"
      Seq((2L * i, t), (2L * i + 1, t))
    } ++ (100 until 110).map(i => (i.toLong, s"zz$i yy$i xx$i ww$i vv$i uu$i"))
    val df = docs.toDF("id", "text")
    val r = Dedup.lshRecallAudit(df, "id", "text", k = 3, numHashes = 4,
      rowsPerBand = 2, threshold = 0.5, sampleMod = 1L).head()
    assert(r.getAs[Long]("sampled_docs") == 50L)
    assert(r.getAs[Long]("truth_pairs") == 20L)
    assert(r.getAs[Long]("candidate_pairs") == 20L)
    assert(r.getAs[Long]("caught_pairs") == 20L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("candidate_precision_ppm") == 1000000L)
  }

  test("lshRecallAudit: moderate-similarity pairs report the recall LSH actually achieves") {
    // shared 9-token prefix differing in the last token: cross-pair
    // jaccard 6/8 = .75 — exactly the borderline band parameters miss
    // sometimes; the audit's job is to REPORT that, not hide it
    val docs = (0 until 20).flatMap { i =>
      val t = s"alpha bravo charlie delta echo foxtrot golf hotel run$i"
      Seq((2L * i, t), (2L * i + 1, t + " extra"))
    }
    val df = docs.toDF("id", "text")
    val r = Dedup.lshRecallAudit(df, "id", "text", k = 3, numHashes = 4,
      rowsPerBand = 2, threshold = 0.5, sampleMod = 1L).head()
    val truth = r.getAs[Long]("truth_pairs")
    val cand = r.getAs[Long]("candidate_pairs")
    val caught = r.getAs[Long]("caught_pairs")
    assert(truth >= 20L) // the 20 built pairs plus high-overlap cross pairs
    assert(caught <= truth && caught <= cand)
    assert(r.getAs[Long]("recall_ppm") == caught * 1000000L / truth)
    assert(r.getAs[Long]("candidate_precision_ppm") == caught * 1000000L / cand)
  }

  test("annRecallAudit: hand-checked 2D geometry, including a probe miss") {
    import graft.functions.Similarity
    // two cells on the axes; corpus points hug one axis each
    val corpus = Seq(
      (10L, Array(1.0, 0.0)), (11L, Array(0.9, 0.1)),
      (12L, Array(0.0, 1.0)), (13L, Array(0.1, 0.9)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("cell_id", "cvec")
    val queries = Seq(
      (100L, Array(1.0, 0.05)),  // x-axis query: truth {10,11} all in cell 0
      (101L, Array(0.05, 1.0)),  // y-axis query: truth {12,13} all in cell 1
      (102L, Array(1.0, 1.0)))   // diagonal: truth {11,13} straddles cells
      .toDF("vec_id", "embedding")
    val out = Similarity.annRecallAudit(corpus, "embedding", "vec_id",
        queries, "vec_id", "embedding", cents, "cell_id", "cvec",
        k = 2, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[Long]("n_truth") == 2L)
    assert(out(100L).getAs[Long]("recall_ppm") == 1000000L)
    assert(out(101L).getAs[Long]("recall_ppm") == 1000000L)
    // the diagonal query's two true neighbors (11 and 13, exact cosine
    // tie) sit in DIFFERENT cells; nProbe=1 probes only cell 0 (tie,
    // lowest cell wins) and finds just id 11 -> measured recall 50%
    assert(out(102L).getAs[Long]("hits") == 1L)
    assert(out(102L).getAs[Long]("recall_ppm") == 500000L)
  }

  test("hardNegatives: picks come from the (skipK, poolK] band, deterministically") {
    import graft.functions.Similarity
    // corpus on a 1D line of descending similarity to the query
    val corpus = (1 to 40).map(i => (i.toLong, Array(1.0, i.toDouble)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(corpus, "embedding", "vec_id",
      queries, "vec_id", "embedding", skipK = 3, poolK = 10, m = 4)
    val rows = out.collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == 4)
    // cosine with (1,0) decreases in i, so rank == i: band is ids 4..10
    assert(rows.forall { case (id, rank) => rank == id && rank > 3 && rank <= 10 })
    // deterministic: a second run draws the identical set
    val again = Similarity.hardNegatives(corpus, "embedding", "vec_id",
      queries, "vec_id", "embedding", skipK = 3, poolK = 10, m = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("lengthBucketBatches: longest-first batches and exact padding accounting") {
    import graft.functions.Sampling
    // bucket 0 (<8 tokens): lengths 7,6,3,2 -> batches of 2: {7,6}, {3,2}
    val docs = Seq(
      (1L, "a a a a a a a"), (2L, "b b b b b b"), (3L, "c c c"), (4L, "d d"),
      (5L, Seq.fill(9)("e").mkString(" ")), // bucket 1, alone
      (6L, "")).toDF("doc_id", "text")      // zero tokens: excluded
    val out = Sampling.lengthBucketBatches(docs, "doc_id", "text",
        bucketWidth = 8L, batchSize = 2)
      .orderBy("bucket", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 7L, 13L, (14L - 13L) * 1000000L / 14L), // pad 1 of 14
      (0L, 1L, 2L, 3L, 5L, (6L - 5L) * 1000000L / 6L),     // pad 1 of 6
      (1L, 0L, 1L, 9L, 9L, 0L)))                           // alone: no pad
  }

  test("lshRecallAudit: empty truth set yields NULL rates") {
    val df = (0 until 8).map(i =>
      (i.toLong, s"aa$i bb$i cc$i dd$i ee$i")).toDF("id", "text")
    val r = Dedup.lshRecallAudit(df, "id", "text", k = 3, numHashes = 4,
      rowsPerBand = 2, threshold = 0.5, sampleMod = 1L).head()
    assert(r.getAs[Long]("truth_pairs") == 0L)
    assert(r.isNullAt(r.fieldIndex("recall_ppm")))
  }
}
