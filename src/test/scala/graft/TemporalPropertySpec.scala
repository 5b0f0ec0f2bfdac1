package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.functions.{Dedup, Temporal}

/** Property-based contracts for the temporal/clustering operators: the
  * distributed implementations must agree with brute-force in-memory
  * references on arbitrary inputs (keys colliding, timestamp ties,
  * disconnected graphs, self-referential edges). Spark-backed cases are
  * capped per property to keep the suite fast. */
object TemporalPropertySpec extends Properties("TemporalOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowGen = for {
    k <- Gen.choose(0L, 3L)
    t <- Gen.choose(0L, 50L)
    v <- Gen.choose(0L, 1000L)
  } yield (k, t, v)

  property("asofJoinBackward agrees with brute-force latest-prior lookup") =
    Prop.forAll(Gen.listOfN(30, rowGen), Gen.listOfN(30, rowGen)) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val right = rs
      val out = Temporal.asofJoinBackward(
          left.toDF("k", "t", "lid"), right.toDF("k", "t", "v"),
          "k", "t", "t", "v", "asof_v")
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = left.map { case (k, t, lid) =>
        val priors = right.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (priors.isEmpty) None else Some(priors.maxBy(r => (r._2, r._3))._3))
      }.toMap
      out == expected
    }

  private val edgeGen = for {
    a <- Gen.choose(0L, 15L)
    b <- Gen.choose(0L, 15L)
  } yield (a, b)

  property("duplicateClusters agrees with brute-force union-find") =
    Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      import spark.implicits._
      val out = Dedup.duplicateClusters(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node of the component
      val byRoot = nodes.groupBy(find)
      val expected = byRoot.flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }
      out == expected
    }

  property("asofJoinForward agrees with brute-force earliest-following lookup") =
    Prop.forAll(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen)) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val out = Temporal.asofJoinForward(
          left.toDF("k", "t", "lid"), rs.toDF("k", "t", "v"),
          "k", "t", "t", "v", "asof_v")
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = left.map { case (k, t, lid) =>
        val nexts = rs.filter(r => r._1 == k && r._2 >= t)
        lid -> (if (nexts.isEmpty) None else Some(nexts.minBy(r => (r._2, r._3))._3))
      }.toMap
      out == expected
    }

  property("sessionize agrees with a brute-force gap scan") =
    Prop.forAll(Gen.listOfN(25, rowGen)) { rows =>
      import spark.implicits._
      val gap = 7L
      val data = rows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val out = Temporal.sessionize(data.toDF("k", "t", "id"), "k", "t", gap, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expected = data.groupBy(_._1).flatMap { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        // split where the time gap to the previous event exceeds `gap`
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
          case (acc, e) => acc match {
            case cur :: rest if e._2 - cur.head._2 <= gap => (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }.reverse
        sessions.zipWithIndex.map { case (s, i) =>
          (k, i + 1L, s.map(_._2).min, s.map(_._2).max, s.size.toLong)
        }
      }.toSet
      out == expected
    }

  property("asofJoinBackwardSalted matches the plain form on arbitrary inputs") =
    Prop.forAll(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen),
        Gen.oneOf(1L, 5L, 13L, 100L)) { (ls, rs, bucket) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rs.toDF("k", "t", "v")
      def norm(df: org.apache.spark.sql.DataFrame) = df.select("lid", "asof_v")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      norm(Temporal.asofJoinBackwardSalted(left, right, "k", "t", "t", "v",
        "asof_v", bucket)) ==
        norm(Temporal.asofJoinBackward(left, right, "k", "t", "t", "v", "asof_v"))
    }

  property("sessionizeSalted matches the plain form on arbitrary inputs") =
    Prop.forAll(Gen.listOfN(25, rowGen), Gen.oneOf(7L, 11L, 50L)) { (rows, bucket) =>
      import spark.implicits._
      val gap = 7L
      val data = rows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
        .toDF("k", "t", "id")
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      norm(Temporal.sessionizeSalted(data, "k", "t", gap, "id", bucket)) ==
        norm(Temporal.sessionize(data, "k", "t", gap, "id"))
    }

  property("bernoulliSample membership equals host-side md5 thresholding") =
    Prop.forAll(Gen.choose(0L, 1000000L)) { ppm =>
      import spark.implicits._
      import org.apache.spark.sql.{functions => F}
      val keys = (0L until 200L).toList
      val got = graft.functions.Sampling
        .bernoulliSample(keys.toDF("id"), F.col("id"), ppm)
        .collect().map(_.getLong(0)).toSet
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = keys.filter { k =>
        val hex = md.digest(k.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 1000000L < ppm
      }.toSet
      got == expected
    }

  property("Md5Bucket expression equals the conv(substring(md5)) spelling") =
    Prop.forAll(Gen.listOfN(50, Gen.alphaNumStr), Gen.choose(1L, 1000000L)) { (keys, buckets) =>
      import spark.implicits._
      import org.apache.spark.sql.{functions => F}
      val df = keys.toDF("k")
      val got = df.select(
          graft.plans.Expressions.md5Bucket(F.col("k"), buckets).as("nb"),
          (F.conv(F.substring(F.md5(F.col("k")), 1, 8), 16, 10)
            .cast("long") % buckets).as("ob"))
        .collect()
      got.forall(r => r.getLong(0) == r.getLong(1))
    }

  property("packSequences chunk ids equal a sequential prefix-sum scan") =
    Prop.forAll(Gen.listOfN(15, Gen.choose(0, 6))) { sizes =>
      import spark.implicits._
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        ("g", i.toLong, Seq.fill(n)("w").mkString(" "))
      }
      val out = graft.functions.Text
        .packSequences(docs.toDF("grp", "id", "text"), "grp", "id", "text", 5L)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      var cum = 0L
      val expected = docs.map { case (_, id, text) =>
        val n = text.split(" ").count(_.nonEmpty).toLong
        val chunk = cum / 5L; cum += n; id -> chunk
      }.toMap
      out == expected
    }

  property("hoppingWindows: every row lands in exactly size/slide covering windows") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(0L, 500L))) { ts =>
      import spark.implicits._
      val (size, slide) = (40L, 10L)
      val rows = Temporal.hoppingWindows(
          ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t"),
          "t", size, slide)
        .select("id", "t", "win_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val perId = rows.groupBy(_._1)
      ts.indices.forall { i =>
        val ws = perId(i.toLong)
        ws.length == (size / slide) &&
          ws.forall { case (_, t, w) => w <= t && t < w + size && w % slide == 0 }
      }
    }

  property("decontaminate equals brute-force n-gram overlap") =
    Prop.forAll(
      Gen.listOfN(12, Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e"))),
      Gen.listOfN(2, Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e")))) { (corpusToks, evalToks) =>
      import spark.implicits._
      val corpus = corpusToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toDF("id", "text")
      val eval = evalToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toDF("id", "text")
      val n = 3
      val kept = Dedup.decontaminate(corpus, "id", "text", eval, "text", n)
        .as[(Long, String)].collect().map(_._1).toSet
      def grams(ts: Seq[String]) = ts.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSet
      val evalGrams = evalToks.flatMap(grams).toSet
      val expected = corpusToks.zipWithIndex.collect {
        case (ts, i) if grams(ts).intersect(evalGrams).isEmpty => i.toLong
      }.toSet
      kept == expected
    }

  property("orderedHistory (bounded first_n) equals the collect_list+slice reference") =
    Prop.forAll(Gen.nonEmptyListOf(rowGen), Gen.choose(1, 6)) { (rows, maxLen) =>
      import spark.implicits._
      // repartition(5) forces partial buffers to serialize and merge across
      // tasks — the TypedImperativeAggregate paths a single partition skips
      val df = rows.toDF("k", "t", "v").repartition(5)
      val out = Temporal.orderedHistory(df, "k", "t", "v", maxLen)
        .as[(Long, String, Long)].collect()
        .map { case (k, h, n) => k -> ((h, n)) }.toMap
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        val hist = g.map(r => (r._2, r._3)).sorted.take(maxLen)
          .map(_._2.toString).mkString("|")
        k -> ((hist, g.size.toLong))
      }
      out == expected
    }

  private val kvGen = for {
    k <- Gen.choose(0L, 2L)
    v <- Gen.choose(0L, 15L)   // heavy collisions: values repeat a lot
  } yield (k, s"v$v")

  property("distinct-heap TopKPerKey agrees with distinct+sort+take on arbitrary duplicated input") =
    Prop.forAll(Gen.listOfN(60, kvGen), Gen.choose(1, 6)) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("k", "v").repartition(5)
      val got = graft.plans.TopK.topKPerKey(df, Seq("k"), "v",
          desc = false, tieBreak = Nil, k = k, distinct = true)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v")))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      val want = rows.groupBy(_._1).map { case (key, rs) =>
        key -> rs.map(_._2).distinct.sorted.take(k).toList
      }
      got == want
    }


  private val digestRowGen = for {
    id <- Gen.choose(1L, 40L)
    p <- Gen.choose(0L, 9L)
  } yield (id, s"p$p")

  property("digestManifest is slice-additive and partition-independent on arbitrary inputs") =
    Prop.forAll(Gen.listOfN(30, digestRowGen), Gen.listOfN(30, digestRowGen)) { (ra, rb) =>
      import spark.implicits._
      def m(rows: Seq[(Long, String)], parts: Int): Map[Long, (Long, BigInt)] =
        graft.functions.Scale.digestManifest(
            rows.toDF("id", "s").repartition(parts), "id", Seq("id", "s"), 4)
          .collect().map(r => r.getAs[Long]("shard") ->
            (r.getAs[Long]("cnt"),
              BigInt(r.getAs[Long]("digest_hi")) * BigInt(2).pow(60) +
                r.getAs[Long]("digest_lo"))).toMap
      val ma = m(ra, 3)
      val mb = m(rb, 5)
      val mu = m(ra ++ rb, 2)
      val additive = (ma.keySet ++ mb.keySet).forall { k =>
        val (c1, d1) = ma.getOrElse(k, (0L, BigInt(0)))
        val (c2, d2) = mb.getOrElse(k, (0L, BigInt(0)))
        mu.getOrElse(k, (0L, BigInt(0))) == (c1 + c2, d1 + d2)
      }
      additive && mu.values.map(_._1).sum == (ra.size + rb.size).toLong
    }

  private val latenessRowGen = for {
    ch <- Gen.choose(0L, 1L)
    arr <- Gen.choose(10L, 99L)
    ts <- Gen.choose(0L, 50L)
  } yield (ch, arr, ts)

  property("watermarkAudit agrees with a brute-force frontier walk on arbitrary inputs") =
    Prop.forAll(Gen.listOfN(25, latenessRowGen), Gen.choose(1L, 20L)) { (rows0, band1) =>
      import spark.implicits._
      // arrival keys must be tie-free per channel (the operator's contract)
      val rows = rows0.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val bands = Seq(0L, band1)
      val got = graft.functions.Temporal.watermarkAudit(
          rows.toDF("ch", "arr", "ts").repartition(4), "ch", "arr", "ts", bands)
        .collect().map(r => r.getAs[Long]("band") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("max_late"))).toMap
      val lates = rows.groupBy(_._1).values.flatMap { chRows =>
        var f = Long.MinValue
        chRows.sortBy(_._2).map { case (_, _, ts) =>
          f = math.max(f, ts); f - ts
        }
      }.toSeq
      val want = lates.groupBy(l => bands.count(_ < l).toLong)
        .view.mapValues(ls => (ls.size.toLong, ls.max)).toMap
      got == want
    }

}
