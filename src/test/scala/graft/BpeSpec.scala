package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}
import graft.functions.Bpe

/** BPE trainer/encoder vs a brute-force in-memory reference (Sennrich-style
  * greedy merges; tie-break highest freq then lexicographic pair). */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- brute-force reference ----
  private def refVocab(docs: Seq[String]): Map[Vector[String], Long] =
    docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord, ws.size.toLong) }

  private def refMergeAll(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(docs: Seq[String], numMerges: Int,
                       minPairCount: Long = 2): Seq[(String, String, Long)] = {
    var vocab = refVocab(docs)
    val merges = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var k = 0
    while (k < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ => ()
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), freq) = counts.minBy { case ((a, b), f) => (-f, a, b) }
        if (freq < minPairCount) continue = false
        else {
          merges += ((a, b, freq))
          vocab = vocab.groupBy { case (syms, _) => refMergeAll(syms, a, b) }
            .map { case (syms, entries) => (syms, entries.values.sum) }
          k += 1
        }
      }
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      var syms = w.map(_.toString).toVector :+ Bpe.EndOfWord
      merges.foreach { case (a, b) => syms = refMergeAll(syms, a, b) }
      syms
    }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new news",
    "the newest of the new lows")

  test("trained merges match the brute-force reference, in order") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = Bpe.train(docs, "text", numMerges = 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refTrain(corpus, 12).zipWithIndex
      .map { case ((a, b, f), i) => (i.toLong, a, b, f) }
    assert(got == want)
    // determinism across runs
    val again = Bpe.train(docs, "text", numMerges = 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(again == got)
  }

  test("encode matches applying the merges in rank order (rank-map equivalence)") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val merges = Bpe.mergeList(Bpe.train(docs, "text", numMerges = 10))
    val texts = corpus ++ Seq("newlow lowest widestest", "a", "", "  spaced   out  ")
    val got = texts.toDF("text").select(Bpe.encode(F.col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val want = texts.map(refEncode(_, merges))
    assert(got == want)
  }

  test("random corpora: trainer and encoder agree with the reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val words = Vector.fill(30)(Vector.fill(1 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(4)).toChar).mkString)
      val docs = Vector.fill(40)(Vector.fill(1 + rnd.nextInt(8))(
        words(rnd.nextInt(words.size))).mkString(" "))
      val merges = Bpe.mergeList(Bpe.train(docs.toDF("text"), "text", numMerges = 8))
      val want = refTrain(docs, 8).map(m => (m._1, m._2))
      assert(merges == want)
      val enc = docs.take(5).toDF("text")
        .select(Bpe.encode(F.col("text"), merges).as("t"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
      assert(enc == docs.take(5).map(refEncode(_, merges)))
    }
  }

  test("batched merges (maxMergesPerRound > 1) reproduce sequential order exactly") {
    import spark.implicits._
    // fixture corpus: the top pairs are both disjoint (batchable rounds)
    // and conflicting (fallback rounds) at different stages
    val docs = corpus.toDF("text")
    val seq12 = Bpe.train(docs, "text", numMerges = 12)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    Seq(2, 4, 8).foreach { m =>
      val rounds = new java.util.concurrent.atomic.AtomicInteger(0)
      val bat = Bpe.train(docs, "text", numMerges = 12, maxMergesPerRound = m,
          roundCounter = rounds)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(bat == seq12, s"maxMergesPerRound=$m diverged")
      // the batch path must actually batch on this fixture — a permanent
      // fallback-to-1 would make this test vacuous
      assert(rounds.get() < seq12.length,
        s"maxMergesPerRound=$m never batched (${rounds.get()} rounds for ${seq12.length} merges)")
    }
    // random corpora: batched == brute-force sequential reference. The
    // 2-char-alphabet rounds maximize chain conflicts (rhs of one top pair
    // = lhs of another) and concat-symbol collisions ("ab" both a merge
    // result and a pre-existing word) — the adversarial ground for the
    // cross-side conflict rule and the existence probe.
    val rnd = new scala.util.Random(13)
    (1 to 6).foreach { it =>
      val nLetters = if (it <= 3) 4 else 2
      val words = Vector.fill(30)(Vector.fill(1 + rnd.nextInt(6))(
        ('a' + rnd.nextInt(nLetters)).toChar).mkString)
      val rdocs = Vector.fill(40)(Vector.fill(1 + rnd.nextInt(8))(
        words(rnd.nextInt(words.size))).mkString(" "))
      val got = Bpe.mergeList(Bpe.train(rdocs.toDF("text"), "text",
        numMerges = 10, maxMergesPerRound = 4))
      assert(got == refTrain(rdocs, 10).map(m => (m._1, m._2)),
        s"iteration $it (alphabet $nLetters) diverged")
    }
  }

  test("encode is lossless: tokens concatenate back to the words (+ end markers)") {
    import spark.implicits._
    val merges = Bpe.mergeList(Bpe.train(corpus.toDF("text"), "text", numMerges = 10))
    val rnd = new scala.util.Random(11)
    // whole codepoints (never lone surrogate halves): multi-byte, a
    // surrogate-pair emoji, punctuation, quoting hazards
    val alphabet = Vector("a", "b", "ä", "π", "😀", "х", "1", ".", ";", "|", "\\", "'", "\"")
    val texts = Vector.fill(50) {
      Vector.fill(rnd.nextInt(6))(
        Vector.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.size))).mkString
      ).mkString(" \t ") // odd whitespace between words
    } ++ corpus
    val got = texts.toDF("text").select(Bpe.encode(F.col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0).mkString(""))
    val want = texts.map(_.split("\\s+").filter(_.nonEmpty)
      .map(_ + Bpe.EndOfWord).mkString(""))
    assert(got.toSeq == want)
  }

  test("SQL face: bpe_encode(text, spec) matches the Column face") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val merges = Bpe.mergeList(Bpe.train(corpus.toDF("text"), "text", numMerges = 8))
    val spec = Bpe.mergesToSpec(merges)
    assert(Bpe.parseMergeSpec(spec) == merges) // spec round-trips
    val df = corpus.toDF("text")
    df.createOrReplaceTempView("bpe_docs")
    val escaped = spec.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n")
    val viaSql = spark.sql(s"SELECT bpe_encode(text, '$escaped') AS t FROM bpe_docs")
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val viaCol = df.select(Bpe.encode(F.col("text"), merges).as("t"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(viaSql == viaCol)
  }

  test("unicode: surrogate pairs stay whole symbols") {
    import spark.implicits._
    val docs = Seq("😀x 😀x 😀y").toDF("text")
    val merges = Bpe.mergeList(Bpe.train(docs, "text", numMerges = 2))
    // the most frequent pair is (emoji, x) or (x, </w>) — either way the
    // emoji must survive as ONE symbol, never split into surrogate halves
    val toks = docs.select(Bpe.encode(F.col("text"), merges).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks.forall(t => !t.exists(c => Character.isSurrogate(c)) ||
      t.codePoints().toArray.forall(Character.isValidCodePoint)))
    assert(toks.mkString("").contains("😀"))
  }
}
