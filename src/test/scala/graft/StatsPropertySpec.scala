package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.functions.{Scale, Text}

/** Property-based contracts for the round-10 planner-statistics operators:
  * the distributed faces must agree with brute-force in-memory references
  * on arbitrary inputs (negative values, constant columns, duplicate-heavy
  * data, probes outside the domain). Spark cases are capped per property
  * to keep the suite fast. */
object StatsPropertySpec extends Properties("StatsOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- DP release tier invariants (r13, the ADVICE-r12 privacy fixes) ----

  property("dpNoisySums: releases live on the public C-lattice for ARBITRARY data; quantization is 1-Lipschitz in C-steps") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L),
        Gen.option(Gen.choose(-50000L, 50000L)))),
      Gen.choose(1L, 30000L), Gen.choose(0L, 10000L)) { (rows, clampC, seed) =>
      // arithmetic face of the ADVICE fix: the lattice index moves by at
      // most one step when the clamped sum moves by at most C (neighbor
      // datasets) -- pure integer property, checked exhaustively-ish
      def q(sum: Long): Long = (2L * sum + clampC) / (2L * clampC)
      val lip = Prop.forAll(Gen.choose(0L, 1000000L), Gen.choose(0L, clampC)) {
        (sum, delta) => math.abs(q(sum + delta) - q(sum)) <= 1L
      }
      // distributed face: every released value is a non-negative multiple
      // of C whatever the data (the support itself is public)
      val sp = spark
      import sp.implicits._
      val out = graft.functions.Stats.dpNoisySums(
        rows.toDF("g", "v"), Seq("g"), "v", clampC = clampC, seed = seed)
        .collect().map(_.getAs[Long]("noisy_sum"))
      lip && Prop(out.forall(r => r >= 0L && r % clampC == 0L)) :| s"off-lattice: ${out.toSeq}"
    }

  property("dpMedian: released values are ALWAYS grid points for arbitrary data (support is data-independent)") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(-500L, 500L))),
      Gen.choose(1L, 50L), Gen.choose(0L, 10000L)) { (rows, step, seed) =>
      val sp = spark
      import sp.implicits._
      val out = graft.functions.Stats.dpMedian(
        rows.toDF("g", "v"), Seq("g"), "v", seed = seed,
        candLo = -500L, candHi = 500L, candStep = step)
        .collect().map(_.getAs[Long]("released_median"))
      Prop(out.forall(v =>
        v >= -500L && v <= 500L && (v + 500L) % step == 0L)) :| s"off-grid: ${out.toSeq}"
    }

  property("geometricThresholds: strictly within [0, 2^60), nondecreasing, median threshold at the CDF midpoint band") =
    Prop.forAll(Gen.choose(2, 16), Gen.choose(1, 40)) { (base, clampB) =>
      val ts = graft.functions.Stats.geometricThresholds(base, clampB)
      val two60 = 1L << 60
      Prop(ts.size == 2 * clampB) &&
        Prop(ts.forall(t => t >= 0L && t < two60)) &&
        Prop(ts.zip(ts.tail).forall { case (a, b) => a <= b }) :| s"not sorted: $ts" &&
        // CDF(-1) = 1/(q+1) and CDF(0) = 1 - 1/(q+1): the zero-noise band
        // straddles the uniform midpoint, so noise=0 is the modal draw
        Prop(ts(clampB - 1) < two60 / 2 && ts(clampB) > two60 / 2)
    }

  property("DpBudget: charge order never lets the product exceed the bound; rejected charges leave the ledger untouched") =
    Prop.forAll(Gen.choose(1, 10),
      Gen.listOf(Gen.oneOf(1, 1, 1, 2))) { (budgetExp, mults) =>
      val b = new graft.functions.DpBudget(BigInt(2).pow(budgetExp), 7L)
      var expected = BigInt(1)
      mults.foreach { m =>
        val next = expected * BigInt(2).pow(m)
        try {
          // charge through the public surface that costs 2^m
          val sp = spark
          import sp.implicits._
          val df = Seq("x").toDF("g")
          if (m == 1) b.noisyCounts(df, Seq("g"))
          else b.median(df.selectExpr("g", "1L AS v"), Seq("g"), "v",
            candLo = 0L, candHi = 4L, candStep = 1L)
          expected = next
        } catch { case _: IllegalStateException => () }
      }
      Prop(b.spentFactor == expected) :| s"ledger ${b.spentFactor} != $expected" &&
        Prop(b.spentFactor <= BigInt(2).pow(budgetExp))
    }

  property("dpHistogram: release frame is EXACTLY domain x bins for arbitrary data/domain overlap (incl. NULL keys); counts reconcile") =
    Prop.forAll(
      Gen.listOf(Gen.zip(Gen.option(Gen.choose(0L, 5L)), Gen.choose(-100L, 100L))),
      Gen.someOf(Option.empty[Long] +: (0L to 7L).map(Some(_))),
      Gen.nonEmptyListOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted).suchThat(_.nonEmpty),
      Gen.choose(0L, 1000L)) { (rows, domKeys, boundaries, seed) =>
      Prop(domKeys.nonEmpty) ==> {
        val sp = spark
        import sp.implicits._
        val df = rows.toDF("g", "v")
        val dom = domKeys.toSeq.toDF("g")
        val out = graft.functions.Stats.dpHistogram(df, Seq("g"), "v",
            boundaries, seed = seed, domain = Some(dom))
          .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
            r.getAs[Long]("bin")) -> r.getAs[Long]("noisy_count")).toMap
        val wantKeys = (for (g <- domKeys; b <- 0L to boundaries.size.toLong)
          yield (g: Option[Long], b)).toSet
        // the release universe is data-INDEPENDENT: every (domain key,
        // bin) cell and nothing else — a NULL domain key releases the
        // NULL-keyed group's bins (null-safe join), off-domain observed
        // groups never appear
        (Prop(out.keySet == wantKeys) :| s"frame ${out.keySet} != $wantKeys") &&
          Prop(out.values.forall(_ >= 0L))
      }
    }

  property("onPublicDomain faces: count release keyset == domain keyset; present-key counts match brute force") =
    Prop.forAll(
      Gen.listOf(Gen.option(Gen.choose(0L, 5L))),
      Gen.someOf(Option.empty[Long] +: (0L to 7L).map(Some(_))),
      Gen.choose(0L, 1000L)) { (rows, domKeys, seed) =>
      Prop(domKeys.nonEmpty) ==> {
        val sp = spark
        import sp.implicits._
        val df = rows.toDF("g")
        val dom = domKeys.toSeq.toDF("g")
        val out = graft.functions.Stats.dpNoisyCounts(df, Seq("g"),
            seed = seed, domain = Some(dom))
          .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
            r.getAs[Long]("noisy_count")).toMap
        val noDom = graft.functions.Stats.dpNoisyCounts(df, Seq("g"), seed = seed)
          .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
            r.getAs[Long]("noisy_count")).toMap
        // keyset = the domain exactly; a key present in both worlds
        // releases the SAME value with or without the domain (the join
        // only re-keys, never perturbs the draw)
        (Prop(out.keySet == domKeys.toSet) :| s"keys ${out.keySet}") &&
          Prop(domKeys.filter(noDom.contains).forall(k => out(k) == noDom(k)))
      }
    }

  property("columnHistogram: bins partition the corpus; every value lands in its bin's bounds") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)),
                Gen.choose(1, 8)) { (vs, buckets) =>
      import spark.implicits._
      val out = Scale.columnHistogram(vs.toDF("v"), "v", buckets)
        .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo"),
          r.getAs[Long]("hi"), r.getAs[Long]("cnt"),
          Option(r.getAs[java.lang.Long]("lo_act")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hi_act")).map(_.toLong)))
      val mn = vs.min; val mx = vs.max
      // counts partition the corpus exactly
      val total = out.map(_._4).sum == vs.size.toLong &&
        out.length == buckets
      // nominal bins tile [mn, mx] contiguously: first lo = mn, each hi+1
      // = next lo, last hi >= mx
      val sorted = out.sortBy(_._1)
      val tiles = sorted.head._2 == mn && sorted.last._3 >= mx &&
        sorted.sliding(2).forall {
          case Array(a, b) => a._3 + 1 == b._2
          case _ => true
        }
      // every non-empty bin's actual bounds sit inside its nominal bounds,
      // and replaying the bin assignment in BigInt agrees with the counts
      val range = BigInt(mx) - mn + 1
      val ref = vs.groupBy(v => ((BigInt(v) - mn) * buckets / range).toLong)
        .view.mapValues(g => (g.size.toLong, g.min, g.max)).toMap
      val bins = sorted.forall { case (b, lo, hi, cnt, loA, hiA) =>
        ref.get(b) match {
          case Some((c, lo2, hi2)) =>
            cnt == c && loA.contains(lo2) && hiA.contains(hi2) &&
              lo <= lo2 && hi2 <= hi
          case None => cnt == 0L && loA.isEmpty && hiA.isEmpty
        }
      }
      total && tiles && bins
    }

  property("selectivityAudit: actuals exact, estimates in [0, n], uniform data within one row per bucket") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-200L, 200L)),
                Gen.listOfN(3, Gen.zip(Gen.choose(-300L, 300L), Gen.choose(0L, 200L)))) {
      (vs, rawProbes) =>
        import spark.implicits._
        val probes = rawProbes.map { case (lo, w) => (lo, lo + w) }.distinct
        val out = Scale.selectivityAudit(vs.toDF("v"), "v", probes)
          .collect().map(r => (r.getAs[Long]("probe_lo"), r.getAs[Long]("probe_hi"),
            r.getAs[Long]("actual"), r.getAs[Long]("est"), r.getAs[Long]("err")))
        val n = vs.size.toLong
        out.length == probes.size && out.forall { case (lo, hi, actual, est, err) =>
          actual == vs.count(v => v >= lo && v <= hi).toLong &&
            est >= 0L && est <= n && err == est - actual
        }
    }

  property("selectivityAuditHist: bin-aligned probes estimated EXACTLY; est_hist in [0, n]; brute interpolation agrees") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-200L, 200L)),
                Gen.choose(-150L, 0L), Gen.choose(1L, 80L)) { (vs, b0, w) =>
      import spark.implicits._
      // strictly ascending boundaries; probe 0 is EXACTLY interior bin 1
      // ([b0, b0+w-1]), probe 1 straddles bins
      val bs = Seq(b0, b0 + w, b0 + 2 * w)
      val probes = Seq((b0, b0 + w - 1), (b0 - w / 2, b0 + w + w / 2))
      val out = Scale.selectivityAuditHist(vs.toDF("v"), "v", probes, bs)
        .collect().map(r => (r.getAs[Long]("probe_lo"), r.getAs[Long]("probe_hi")) ->
          (r.getAs[Long]("actual"), r.getAs[Long]("est_uniform"),
            r.getAs[Long]("est_hist"), r.getAs[Long]("err_hist"))).toMap
      val n = vs.size.toLong
      val mn = vs.min; val mx = vs.max
      // brute reference of the interpolation contract
      def binOf(v: Long) = bs.count(_ <= v)
      val cnt = (0 to bs.size).map(j => vs.count(binOf(_) == j).toLong)
      def bloOf(j: Int) = if (j == 0) mn else bs(j - 1)
      def bhiOf(j: Int) = if (j == bs.size) mx else bs(j) - 1
      def estHist(lo: Long, hi: Long): Long = (0 to bs.size).map { j =>
        val (blo, bhi) = (bloOf(j), bhiOf(j))
        val width = bhi - blo + 1
        if (width < 1) BigInt(0)
        else BigInt(cnt(j)) *
          (math.min(hi, bhi) - math.max(lo, blo) + 1).max(0L) / width
      }.sum.toLong
      out.size == probes.size && probes.forall { case (lo, hi) =>
        val (actual, estU, estH, errH) = out((lo, hi))
        actual == vs.count(v => v >= lo && v <= hi).toLong &&
          estH == estHist(lo, hi) && estH >= 0L && estH <= n &&
          estU >= 0L && estU <= n && errH == estH - actual &&
          // a probe EXACTLY covering interior bin 1 is estimated with
          // zero error: its overlap == width and every other bin's
          // overlap is 0 (or the clamped edge bin is empty)
          ((lo, hi) != (b0, b0 + w - 1) || estH == actual)
      }
    }

  property("conjunctiveJointHistAudit: cell-aligned probes estimated EXACTLY; brute 2D interpolation agrees; est in [0, n]") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(-60L, 60L), Gen.choose(-60L, 60L))),
                Gen.choose(-40L, 0L), Gen.choose(1L, 30L),
                Gen.choose(-40L, 0L), Gen.choose(1L, 30L)) { (ps, a0, wa, b0, wb) =>
      import spark.implicits._
      val aBs = Seq(a0, a0 + wa, a0 + 2 * wa)
      val bBs = Seq(b0, b0 + wb, b0 + 2 * wb)
      // probe 0 EXACTLY covers interior cell (1,1) on both axes; probe 1
      // straddles cells on both axes
      val probes = Seq((a0, a0 + wa - 1, b0, b0 + wb - 1),
        (a0 - wa / 2, a0 + wa + wa / 2, b0 - wb / 2, b0 + wb + wb / 2))
      val out = Scale.conjunctiveJointHistAudit(ps.toDF("a", "b"), "a", "b",
          probes, aBs, bBs)
        .collect().map(r => (r.getAs[Long]("a_lo"), r.getAs[Long]("a_hi"),
          r.getAs[Long]("b_lo"), r.getAs[Long]("b_hi")) ->
          (r.getAs[Long]("actual"), r.getAs[Long]("est_joint"))).toMap
      val n = ps.size.toLong
      val (mnA, mxA) = (ps.map(_._1).min, ps.map(_._1).max)
      val (mnB, mxB) = (ps.map(_._2).min, ps.map(_._2).max)
      def binOf(v: Long, bs: Seq[Long]) = bs.count(_ <= v)
      def edges(j: Int, bs: Seq[Long], mn: Long, mx: Long) =
        (if (j == 0) mn else bs(j - 1), if (j == bs.size) mx else bs(j) - 1)
      def brute(alo: Long, ahi: Long, blo: Long, bhi: Long): Long =
        (for (i <- 0 to aBs.size; j <- 0 to bBs.size) yield {
          val cnt = ps.count(p => binOf(p._1, aBs) == i && binOf(p._2, bBs) == j).toLong
          val (ealo, eahi) = edges(i, aBs, mnA, mxA)
          val (eblo, ebhi) = edges(j, bBs, mnB, mxB)
          val wA = eahi - ealo + 1
          val wB = ebhi - eblo + 1
          if (wA < 1 || wB < 1) BigInt(0)
          else BigInt(cnt) * (math.min(ahi, eahi) - math.max(alo, ealo) + 1).max(0L) *
            (math.min(bhi, ebhi) - math.max(blo, eblo) + 1).max(0L) / (BigInt(wA) * wB)
        }).sum.toLong
      out.size == probes.size && probes.forall { case (alo, ahi, blo, bhi) =>
        val (actual, est) = out((alo, ahi, blo, bhi))
        actual == ps.count(p => p._1 >= alo && p._1 <= ahi &&
          p._2 >= blo && p._2 <= bhi).toLong &&
          est == brute(alo, ahi, blo, bhi) && est >= 0L && est <= n &&
          // the doubly-aligned probe: its one cell contributes its whole
          // count (overlap == width on BOTH axes), every other cell 0
          ((alo, ahi, blo, bhi) != probes.head || est == actual)
      }
    }

  property("quantileSketch: sharded merge == direct (lossless); estimates are sample values, monotone in q") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("g1", "g2"), Gen.choose(0L, 40L), Gen.choose(-500L, 500L)))) { rows =>
      import spark.implicits._
      // ids COLLIDE on purpose (0..40 over up-to-100 rows): the (hash,
      // value) tie-break must keep the selection deterministic
      val df = rows.toDF("g", "id", "v")
      val qs = Seq(0L, 250000L, 500000L, 750000L, 1000000L)
      def read(d: org.apache.spark.sql.DataFrame) =
        Scale.quantileEstimate(d, "g", qs)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
      val direct = read(Scale.quantileSketch(df, "g", "id", "v", k = 8))
      val merged = read(Scale.quantileSketchSharded(df, "g", "id", "v",
        org.apache.spark.sql.functions.col("id") % 3, k = 8))
      val inputVals = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
      direct == merged && direct.forall { case ((g, _), (n, est)) =>
        n >= 1L && n <= 8L && inputVals(g).contains(est)
      } && direct.keys.map(_._1).toSet.forall { g =>
        // estimates never decrease as q grows
        qs.map(q => direct((g, q))._2).sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        }
      }
    }

  property("histogramJoinEstimate: per-bin estimate matches brute interpolation; actual is the exact join count") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-50L, 150L)),
                Gen.nonEmptyListOf(Gen.choose(-50L, 150L))) { (as, bs) =>
      import spark.implicits._
      val bounds = Seq(0L, 40L, 80L)
      val out = Scale.histogramJoinEstimate(as.toDF("x"), "x", bs.toDF("y"), "y", bounds)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      def binOf(v: Long) = bounds.count(_ <= v)
      val ca = (0 to bounds.size).map(j => as.count(binOf(_) == j).toLong)
      val cb = (0 to bounds.size).map(j => bs.count(binOf(_) == j).toLong)
      val mnU = math.min(as.min, bs.min); val mxU = math.max(as.max, bs.max)
      def bloOf(j: Int) = if (j == 0) mnU else bounds(j - 1)
      def bhiOf(j: Int) = if (j == bounds.size) mxU else bounds(j) - 1
      val refEst = (0 to bounds.size).map { j =>
        val w = bhiOf(j) - bloOf(j) + 1
        if (w < 1) 0L else (BigInt(ca(j)) * cb(j) / w).toLong
      }
      val actual = as.map(a => bs.count(_ == a).toLong).sum
      out.size == bounds.size + 1 && (0 to bounds.size).forall { j =>
        val (cntA, cntB, est, estTot, act) = out(j.toLong)
        cntA == ca(j) && cntB == cb(j) && est == refEst(j) &&
          estTot == refEst.sum && act == actual
      }
    }

  property("sketchKsDistance: zero on identical inputs; bounded; matches brute CDF-gap on the samples") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(-100L, 100L))),
                Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(-100L, 100L)))) {
      (as, bs) =>
        import spark.implicits._
        val da = as.toDF("id", "v"); val db = bs.toDF("id", "v")
        def row(x: org.apache.spark.sql.DataFrame) = {
          val r = x.head()
          (r.getAs[Long]("n_samp_a"), r.getAs[Long]("n_samp_b"),
            r.getAs[Long]("d_ppm"), r.getAs[Long]("at_value"))
        }
        val (_, _, dSelf, _) = row(Scale.sketchKsDistance(da, "id", "v", da, "id", "v", k = 8))
        val (nsa, nsb, d, at) = row(Scale.sketchKsDistance(da, "id", "v", db, "id", "v", k = 8))
        // brute reference over the SAME deterministic samples
        def samp(rows: Seq[(Long, Long)]) =
          rows.map { case (id, v) =>
            (java.security.MessageDigest.getInstance("MD5")
              .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, v)
          }.distinct.sorted.take(8).map(_._2)
        val sa = samp(as); val sb = samp(bs)
        val u = (sa ++ sb).distinct.sorted
        val gaps = u.map(v => math.abs(
          sa.count(_ <= v).toLong * 1000000 / sa.size -
          sb.count(_ <= v).toLong * 1000000 / sb.size))
        val dRef = gaps.max
        val atRef = u(gaps.indexOf(dRef))
        dSelf == 0L && d == dRef && at == atRef &&
          d >= 0L && d <= 1000000L && nsa == sa.size.toLong && nsb == sb.size.toLong
    }

  property("weightedQuantiles: exact weight-CDF pick matches brute force; q=1e6 hits the max value") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("g1", "g2"), Gen.choose(-50L, 50L), Gen.choose(1L, 20L)))) { rows =>
      import spark.implicits._
      val qs = Seq(250000L, 500000L, 1000000L)
      val out = Scale.weightedQuantiles(rows.toDF("g", "v", "w"),
          "g", "v", "w", qs)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        qs.map { q =>
          val target = (BigInt(q) * tot + 999999) / 1000000
          var acc = 0L
          var ans = Option.empty[Long]
          byV.foreach { case (v, w) =>
            acc += w
            if (ans.isEmpty && acc >= target) ans = Some(v)
          }
          (g, q) -> (tot, ans.get)
        }
      }.toMap
      out == ref && out.collect { case ((g, 1000000L), (_, est)) =>
        est == rows.filter(_._1 == g).map(_._2).max
      }.forall(identity)
    }

  property("unigramConcentration: Simpson ppm matches the brute-force count table; bounds hold") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("s1", "s2"),
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))) { docs =>
      import spark.implicits._
      val out = Text.unigramConcentration(docs.toDF("source", "text"),
          "source", "text")
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
            r.getAs[Long]("simpson_ppm"), r.getAs[Long]("eff_vocab"))).toMap
      val ref = docs.groupBy(_._1).view.mapValues { ds =>
        val words = ds.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = BigInt(words.size)
        val c2 = counts.values.map(c => BigInt(c) * c).sum
        (words.size.toLong, counts.size.toLong,
          (c2 * 1000000 / (n * n)).toLong, ((n * n) / c2).toLong)
      }.toMap
      out == ref && out.values.forall { case (n, vocab, sppm, eff) =>
        // Simpson in [1e6/vocab, 1e6]; effective vocab in [1, vocab]
        sppm >= 1000000L / math.max(vocab, 1L) - 1 && sppm <= 1000000L &&
          eff >= 1L && eff <= math.max(vocab, 1L)
      }
    }
}
