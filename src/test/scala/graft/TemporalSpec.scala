package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Sampling, Stats, Temporal, Text}

/** Temporal, clustering, and sampling operators — deterministic
  * micro-fixtures with hand-checked expectations. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("asofJoinBackward: latest prior right value, inclusive at equal ts") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 50L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (3L, 1L, 999L))
      .toDF("k", "t", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "t", "v", "asof_v")
      .select("name", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(out("p0").isEmpty)        // before any right row
    assert(out("p1").contains(100L)) // equal ts included (backward-inclusive)
    assert(out("p2").contains(101L)) // latest of the two priors
    assert(out("p3").isEmpty)        // key with no right rows at all
  }

  test("asofJoinBackward: right-side tie on ts resolves to greatest value") {
    val left = Seq((1L, 10L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L)).toDF("k", "t", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "t", "v", "asof_v")
    assert(out.select("asof_v").head().getLong(0) == 9L)
  }

  test("sessionize: gap splits, bounds and counts per session") {
    // user 1: events at 0, 10, 100 with gap 50 → sessions {0,10} and {100}
    val df = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 100L, 3L), (2L, 5L, 4L))
      .toDF("u", "t", "id")
    val out = Temporal.sessionize(df, "u", "t", gapTicks = 50L, tieBreak = "id")
      .orderBy("u", "session_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 10L, 2L),
      (1L, 2L, 100L, 100L, 1L),
      (2L, 1L, 5L, 5L, 1L)))
  }

  test("hoppingWindows: each row lands in size/slide windows incl. boundary") {
    val df = Seq((0L, "a"), (10L, "b"), (19L, "c")).toDF("t", "name")
    val out = Temporal.hoppingWindows(df, "t", sizeTicks = 20L, slideTicks = 10L)
      .select("name", "win_start").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out("a") == Seq(-10L, 0L))
    assert(out("b") == Seq(0L, 10L))
    assert(out("c") == Seq(0L, 10L)) // 19 < 20: still the [0,20) and [10,30) windows
  }

  test("bandJoin: broadcast range probe, no shuffle of the fact side") {
    val facts = Seq((1L, 5.0), (2L, 55.0), (3L, -1.0)).toDF("id", "v")
    val bands = Seq(("lo", 0.0, 50.0), ("hi", 50.0, 100.0)).toDF("band", "lo", "hi")
    val joined = Temporal.bandJoin(facts, "v", bands, "lo", "hi")
    val rows = joined.select("id", "band").as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "lo", 2L -> "hi")) // -1.0 matches no band
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("duplicateClusters: chains and stars collapse to min-id components") {
    // components: {1,2,3,4} (chain), {10,11,12} (star on 10), {20,21}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (21L, 20L))
      .toDF("a", "b")
    val out = Dedup.duplicateClusters(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("tfidfTopTerms: rare terms outscore common ones, ties break by term") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "banana banana banana")).toDF("id", "text")
    val out = Text.tfidfTopTerms(docs, "id", "text", topN = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    // doc 1: apple tf=2 df=1 → 6.0 beats banana (tf=1 df=3 → 1.0)
    assert(out(1L) == "apple")
    assert(out(2L) == "cherry") // cherry 3.0 beats banana 1.0
    assert(out(3L) == "banana") // only term
  }

  test("zscoreOutliers flags the far point with integer-exact moments") {
    // group: 0,0,0,0,100 → mean 20, var (8000-2000)/5? hand-check:
    // s=100, ss=10000, n=5 → mean 20, var (10000 - 2000)/5 = 1600, σ=40
    // |100-20| = 80 > 1.5σ(=60) → only the 100 row flagged at 1.5σ
    val df = Seq((1L, "g", 0L), (2L, "g", 0L), (3L, "g", 0L), (4L, "g", 0L),
      (5L, "g", 100L)).toDF("id", "grp", "v")
    val out = Stats.zscoreOutliers(df, "grp", "id", "v", sigmas = 1.5)
    val rows = out.select("id", "mean", "stddev").as[(Long, Double, Double)].collect()
    assert(rows.toSeq == Seq((5L, 20.0, 40.0)))
  }

  test("movingAvg: trailing window shrinks at the head, exact integer sums") {
    val df = Seq((1L, 1L, 1L, 10L), (1L, 2L, 2L, 20L), (1L, 3L, 3L, 60L))
      .toDF("k", "t", "id", "v")
    val out = Stats.movingAvg(df, "k", "t", "id", "v", window = 2, outCol = "ma")
      .orderBy("t").select("ma").as[Double].collect().toSeq
    assert(out == Seq(10.0, 15.0, 40.0))
  }

  test("packSequences: linear chunking by cumulative token budget, per partition") {
    val docs = Seq(
      ("en", 1L, "a b c"),      // before=0 → chunk 0
      ("en", 2L, "d e"),        // before=3 → chunk 0
      ("en", 3L, "f g"),        // before=5 → chunk 1
      ("de", 4L, "x y z w"))    // separate partition → chunk 0
      .toDF("lang", "doc_id", "text")
    val out = Text.packSequences(docs, "lang", "doc_id", "text", budgetTokens = 4L)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("dropNearDups keeps exactly one member per near-dup cluster") {
    // J(1,2)=1 → band collision guaranteed (LSH candidate recall is
    // probabilistic below that; the q39/q74 oracles cover the partial-J tier)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with no overlap at all"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(docs, "doc_id", "text",
        k = 3, numHashes = 4, rowsPerBand = 2, threshold = 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L)) // canonical (min id) survives, 2 dropped
  }

  test("expectations gate: one-pass violation counts, enforce throws over tolerance") {
    import graft.functions.Expectations
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 7.0)).toDF("id", "v")
    val checks = Seq(
      "id_not_null" -> F.col("id").isNotNull,
      "v_positive" -> (F.col("v") > 0))
    val rows = Expectations.check(df, checks)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows("id_not_null") == (0L, 0L))
    assert(rows("v_positive") == (1L, 333333L))
    Expectations.enforce(df, checks, maxViolationPpm = 400000L) // passes
    val e = intercept[IllegalArgumentException] {
      Expectations.enforce(df, checks, maxViolationPpm = 0L)
    }
    assert(e.getMessage.contains("v_positive"))
  }

  test("redactPii masks emails and phone runs, leaves prose alone") {
    val out = Seq("mail me at jo.doe+x@foo-bar.example or call 555 123-4567 ok")
      .toDF("t").select(Text.redactPii($"t")).head().getString(0)
    assert(out == "mail me at <EMAIL> or call <PHONE> ok")
    val clean = Seq("regular text with numbers 42 and 7").toDF("t")
      .select(Text.redactPii($"t")).head().getString(0)
    assert(clean == "regular text with numbers 42 and 7")
  }

  test("intervalJoin: bucket-exploded equi-join matches brute force, pairs meet exactly once, no nested-loop plan") {
    val points = Seq((1L, 3L), (2L, 7L), (3L, 15L), (4L, 20L), (5L, 21L))
      .toDF("pid", "t")
    // [0,10] and [5,20] overlap; [5,20] straddles bucket boundaries at 4
    val ivs = Seq((10L, 0L, 10L), (20L, 5L, 20L)).toDF("iid", "s", "e")
    val got = Temporal.intervalJoin(points, "t", ivs, "s", "e", bucketTicks = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    // brute force: t=3 -> [0,10]; t=7 -> both; t=15 -> [5,20];
    // t=20 -> [5,20] (END-INCLUSIVE); t=21 -> none. Seq (not Set):
    // duplicates from an interval covering several buckets would show
    val brute = Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 20L))
    assert(got.toSet == brute && got.size == brute.size)
    // bucket granularity never changes the answer (coarser than every
    // interval, finer than every gap)
    Seq(1L, 7L, 100L).foreach { b =>
      val g = Temporal.intervalJoin(points, "t", ivs, "s", "e", bucketTicks = b)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(g.toSet == brute && g.length == brute.size, s"bucket $b")
    }
    // degenerate single-instant interval [9, 9]
    val inst = Temporal.intervalJoin(Seq((9L, 9L)).toDF("pid", "t"), "t",
      Seq((1L, 9L, 9L)).toDF("iid", "s", "e"), "s", "e", bucketTicks = 4L)
    assert(inst.count() == 1L)
    // the plan is a KEYED join on the bucket — a raw BETWEEN condition
    // would force BroadcastNestedLoop, which is exactly what this
    // spelling exists to avoid on fact-to-fact inputs
    val plan = Temporal.intervalJoin(points, "t", ivs, "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
      s"nested-loop leaked into the interval join:\n$plan")
  }

  test("intervalJoin property: seeded random intervals/points match brute force at any bucket size") {
    val rnd = new scala.util.Random(97)
    (1 to 6).foreach { trial =>
      val nP = 30 + rnd.nextInt(40)
      val nI = 10 + rnd.nextInt(20)
      // negative domain included: bucket ids come from truncating DIV,
      // which is monotone — the property pins that the spelling survives
      // the negative range where floor and trunc diverge
      val pts = (1 to nP).map(i => (i.toLong, rnd.between(-50L, 150L)))
      val ivs = (1 to nI).map { i =>
        val a = rnd.between(-60L, 140L)
        (i.toLong, a, a + rnd.nextInt(30).toLong)
      }
      val brute = (for {
        (p, t) <- pts
        (iid, s, e) <- ivs if t >= s && t <= e
      } yield (p, iid)).toSet
      Seq(1L, 7L, 64L).foreach { b =>
        val got = Temporal.intervalJoin(pts.toDF("pid", "t"), "t",
            ivs.toDF("iid", "s", "e"), "s", "e", bucketTicks = b)
          .select("pid", "iid").as[(Long, Long)].collect()
        assert(got.toSet == brute && got.length == brute.size,
          s"trial $trial bucket $b: got ${got.length}, want ${brute.size}")
      }
    }
  }

  test("redactPiiReport: per-category span counts + checksum of the actual redacted text") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val df = Seq(
      (1L, "mail a@b.co and c.d@e.org, call 555-123-4567"),
      (2L, "no pii here"),
      (3L, "digits 12 34 only")).toDF("doc_id", "text")
    val out = Text.redactPiiReport(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(out(0).getAs[String]("redacted_fp") ==
      md5hex("mail <EMAIL> and <EMAIL>, call <PHONE>"))
    // short digit runs (< 8 chars) are not phone-shaped; prose untouched
    assert(out(1).getAs[Long]("n_emails") == 0L && out(1).getAs[Long]("n_phones") == 0L)
    assert(out(1).getAs[String]("redacted_fp") == md5hex("no pii here"))
    assert(out(2).getAs[Long]("n_phones") == 0L)
  }

  test("operator argument validation fails fast with named errors") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      Temporal.hoppingWindows(df, "a", sizeTicks = 30L, slideTicks = 20L)
    }
    assert(e1.getMessage.contains("multiple"))
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.TopK.topKPerKey(df, Seq("a"), "b", desc = true, Nil, k = 0)
    }
    assert(e2.getMessage.contains("positive"))
    val e3 = intercept[IllegalArgumentException] {
      graft.plans.TopK.topKPerKey(df, Seq("missing"), "b", desc = true, Nil, k = 1)
    }
    assert(e3.getMessage.contains("missing"))
  }

  test("Stream facade delegates asofJoin / sessionize / sample") {
    import graft.api.Stream
    val ev = Seq((1L, 10L, 5L), (1L, 20L, 6L)).toDF("k", "t", "id")
    val rt = Seq((1L, 15L, 99L)).toDF("k", "t", "v")
    val asof = new Stream(ev).asofJoin(new Stream(rt), "k", "t", "t", "v", "av")
      .toDF.orderBy("id").select("av").as[Option[Long]].collect().toSeq
    assert(asof == Seq(None, Some(99L)))
    assert(new Stream(ev).sessionize("k", "t", 100L, "id").toDF.count() == 1)
    val s = new Stream(spark.range(100).toDF("id"))
      .sample(F.col("id"), 500000L).toDF.count()
    assert(s > 20 && s < 80)
  }

  test("leakFreeSplit: cluster members always land on the same side") {
    val docs = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // clusters: {1..10} together, {20,21} together
    val clusters = ((1L to 10L).map(i => (i, 1L)) ++ Seq((20L, 20L), (21L, 20L)))
      .toDF("id", "cluster_id")
    val split = Sampling.leakFreeSplit(docs, "doc_id", clusters, "id", "cluster_id",
        testPpm = 500000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 100)
    assert((1L to 10L).map(split).toSet.size == 1) // one side only
    assert(Set(split(20L), split(21L)).size == 1)
    assert(split.values.toSet == Set("train", "test")) // both sides populated
  }

  test("bm25: rare query terms outweigh common ones, misses score zero-rows") {
    val docs = Seq(
      (1L, "rare word here"),
      (2L, "common common common word"),
      (3L, "common stuff"),
      (4L, "nothing relevant at all")).toDF("id", "text")
    val out = Text.bm25(docs, "id", "text", Seq("rare", "common"))
      .select("id", "n_hit_terms", "score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(4L))               // no query terms → no row
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L)
    // 'rare' (df=1) in doc 1 outweighs 'common' (df=2) in doc 2 despite tf=3
    assert(out(1L)._3 > out(3L)._3)
    assert(out.values.forall(_._3 > 0.0))
  }

  test("sampling is deterministic, stratified thresholds apply per stratum") {
    val df = spark.range(1000).toDF("id")
    val a = Sampling.bernoulliSample(df, F.col("id"), 200000L).count()
    val b = Sampling.bernoulliSample(df, F.col("id"), 200000L).count()
    assert(a == b)               // same rows every run — hash, not RNG
    assert(a > 120 && a < 280)   // ~20%

    val strat = spark.range(1000)
      .withColumn("s", F.when(F.col("id") % 2 === 0, "keep_all").otherwise("drop_all"))
    val out = Sampling.stratifiedSample(strat, F.col("s"), F.col("id"),
      Map("keep_all" -> 1000000L), defaultPpm = 0L)
    assert(out.count() == 500)
    assert(out.where(F.col("s") === "drop_all").count() == 0)

    val split = Sampling.trainTestSplit(df, F.col("id"), 100000L)
    assert(split.count() == 1000) // partition, not filter
    val test = split.where(F.col("split") === "test").count()
    assert(test > 50 && test < 170) // ~10%

    assert(Sampling.fixedSizeSample(df, F.col("id"), 37).count() == 37)
  }

  test("mixByWeight keeps the binding source whole and downsamples the rest to ratio") {
    val big = spark.range(1000).toDF("id").withColumn("src", F.lit("big"))
    val small = spark.range(5000, 5100).toDF("id").withColumn("src", F.lit("small"))
    // equal weights, 10:1 sizes → 'small' binds (kept whole), 'big' → ~10%
    val mix = Sampling.mixByWeight(Seq(
      (big, F.col("id"), 1L), (small, F.col("id"), 1L)))
    val bySrc = mix.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") == 100L, "binding source must survive in full")
    assert(bySrc("big") > 60 && bySrc("big") < 140, s"~100 expected, got ${bySrc("big")}")
    // deterministic: the same mix every run
    val again = Sampling.mixByWeight(Seq(
      (big, F.col("id"), 1L), (small, F.col("id"), 1L)))
    assert(mix.collect().map(_.getLong(0)).sorted
      .sameElements(again.collect().map(_.getLong(0)).sorted))
  }

  test("watermarkAudit: running-frontier lateness bands, per-key isolation, ppm accounting") {
    import spark.implicits._
    // key A arrivals 1..5 with ts [10, 5, 20, 19, 30]:
    // frontier [10,10,20,20,30] -> lateness [0,5,0,1,0]
    // key B fully ordered -> all lateness 0
    val rows = Seq(("A", 1L, 10L), ("A", 2L, 5L), ("A", 3L, 20L),
      ("A", 4L, 19L), ("A", 5L, 30L),
      ("B", 1L, 1L), ("B", 2L, 2L), ("B", 3L, 3L))
    val out = graft.functions.Temporal.watermarkAudit(
      rows.toDF("k", "arr", "ts"), "k", "arr", "ts", Seq(0L, 2L, 10L))
      .collect().map(r => r.getAs[Long]("band") -> r).toMap
    // band 0: lateness 0 (3 from A + 3 from B); band 1: late 1; band 2: late 5
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getAs[Long]("n_rows") == 6L && out(0L).getAs[Long]("max_late") == 0L)
    assert(out(1L).getAs[Long]("n_rows") == 1L && out(1L).getAs[Long]("max_late") == 1L)
    assert(out(2L).getAs[Long]("n_rows") == 1L && out(2L).getAs[Long]("max_late") == 5L)
    assert(out(0L).getAs[Long]("rows_ppm") == 6L * 1000000L / 8L)
    assert(out.values.map(_.getAs[Long]("n_rows")).sum == 8L)
    // partitioning/order independence of the input frame
    val shuffled = graft.functions.Temporal.watermarkAudit(
      rows.toDF("k", "arr", "ts").repartition(5).orderBy(F.rand(9)),
      "k", "arr", "ts", Seq(0L, 2L, 10L))
      .collect().map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_rows")).toMap
    assert(shuffled == out.view.mapValues(_.getAs[Long]("n_rows")).toMap)
  }
}
